"""Mean-field ADVI (samplers/vi.py) — the reference has no variational
sampler; validated on a known Gaussian target and a tiny field-level model."""
import numpy as np

import jax
import jax.numpy as jnp
import jax.random as jr

from montecosmo_tpu.samplers import advi


def test_advi_gaussian_target():
    loc = {"a": jnp.asarray([2.0, -1.0]), "b": jnp.asarray(0.5)}
    scale = {"a": jnp.asarray([0.5, 1.5]), "b": jnp.asarray(2.0)}

    def logpdf(p):
        lp = 0.0
        for k in loc:
            z = (p[k] - loc[k]) / scale[k]
            lp += jnp.sum(-0.5 * z**2 - jnp.log(scale[k]))
        return lp

    start = {"a": jnp.zeros(2), "b": jnp.zeros(())}
    post, elbos = advi(logpdf, start, n_steps=3000, n_mc=8, lr0=5e-2)

    np.testing.assert_allclose(np.asarray(post.mean["a"]), [2.0, -1.0],
                               atol=0.15)
    np.testing.assert_allclose(float(post.mean["b"]), 0.5, atol=0.3)
    np.testing.assert_allclose(np.asarray(post.std["a"]), [0.5, 1.5],
                               rtol=0.25)
    # ELBO improves and converges near the analytic optimum 0 - d/2 log(2pi e)
    assert float(elbos[-1]) > float(elbos[0])

    draws = post.sample(jr.key(0), 4000)
    np.testing.assert_allclose(np.asarray(draws["a"]).mean(0), [2.0, -1.0],
                               atol=0.2)


def test_advi_field_level_smoke():
    from montecosmo_tpu.models.model import FieldLevelModel, default_config

    cfg = default_config | dict(
        final_shape=(8, 8, 8), cell_length=16.0, box_center=(0.0, 0.0, 500.0),
        evolution="kaiser", a_obs=0.5, curved_sky=False, init_oversamp=1.0,
        evol_oversamp=1.0, ptcl_oversamp=1.0, paint_oversamp=1.0)
    m = FieldLevelModel(**cfg)
    params = m.reparam(dict(m.fiduc), inv=True)
    params["white_mesh_"] = jr.normal(jr.key(0), m.init_shape)
    pred = m.predict(seed=1, samples=params, hide_base=False, hide_det=False,
                     hide_samp=False)
    obs = {"count_mesh": pred["count_mesh"]}

    logpdf = lambda p: m.logpdf({**p, **obs})
    post, elbos = advi(logpdf, params, n_steps=60, n_mc=2, lr0=1e-2)
    assert np.all(np.isfinite(np.asarray(elbos)))
    assert float(elbos[-1]) > float(elbos[0])
    d = post.sample(jr.key(2), 2)
    assert d["white_mesh_"].shape == (2, 8, 8, 8)
