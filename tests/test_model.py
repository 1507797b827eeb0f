"""FieldLevelModel: prior predictive, logpdf, reparam round trips.

Hermetic versions of the reference's runtime sanity checks
(run/infer.py:153-157 fiducial-logpdf finite check) and the reparam
bit-exactness requirement (model.py:953-995).
"""
import numpy as np
import pytest
import jax
from jax import numpy as jnp, random as jr

from montecosmo_tpu import FieldLevelModel, default_config

SMALL = dict(default_config)
SMALL.update(final_shape=(16, 16, 16), cell_length=25.0, evolution="kaiser",
             a_obs=0.5, curved_sky=False, box_center=(0.0, 0.0, 1000.0),
             lik_type="quad_gauss", precond="kaiser",
             init_oversamp=1.0, evol_oversamp=1.0, ptcl_oversamp=1.0,
             paint_oversamp=1.0)


@pytest.fixture(scope="module")
def model():
    return FieldLevelModel(**SMALL)


@pytest.fixture(scope="module")
def lpt_model():
    conf = dict(SMALL)
    conf.update(evolution="lpt", lpt_order=2)
    return FieldLevelModel(**conf)


def test_shapes(model):
    assert model.init_shape == (16, 16, 16)
    assert model.box_size[0] == 400.0
    assert model.groups["cosmo"] == ["Omega_m", "sigma8"]
    assert "white_mesh_" in model.groups_["init_"]


def test_predict_prior(model):
    pred = model.predict(seed=0, hide_det=False, hide_base=False)
    assert "count_mesh" in pred and "gxy_mesh" in pred
    gxy = np.asarray(pred["gxy_mesh"])
    assert gxy.shape == (16, 16, 16)
    np.testing.assert_allclose(gxy.mean(), 1.0, atol=0.2)
    assert np.all(np.isfinite(np.asarray(pred["count_mesh"])))


def test_predict_batched(model):
    pred = model.predict(seed=0, samples=3)
    assert np.asarray(pred["count_mesh"]).shape[0] == 3


def _fiducial_params(model, seed=0):
    """Sample-space params at the fiducial point (plus a white-noise field),
    and a count_mesh generated at exactly those params — the reference's
    fiducial-logpdf sanity setup (run/infer.py:147-157)."""
    params = model.reparam(dict(model.fiduc), inv=True)  # scalar latents
    params["white_mesh_"] = jr.normal(jr.key(seed), model.init_shape)
    pred = model.predict(seed=seed + 1, samples=params, hide_base=False,
                         hide_det=False, hide_samp=False)
    params["count_mesh"] = pred["count_mesh"]
    return params


def test_logpdf_finite_at_fiducial(model):
    params = _fiducial_params(model)
    lp = model.logpdf(params)
    assert np.isfinite(float(lp)), lp


def test_logpdf_grad(model):
    full = _fiducial_params(model)
    obs = {"count_mesh": full.pop("count_mesh")}
    params = {k: jnp.asarray(v) for k, v in full.items()}

    g = jax.grad(lambda p: model.logpdf({**p, **obs}))(params)
    for k, v in g.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    assert float(jnp.abs(g["white_mesh_"]).max()) > 0


def test_recenter_logpdf(model):
    """recenter_logpdf shifts logpdf by a CONSTANT (per-site scalar
    zero-points — the f32 large-mesh energy-difference fix) and leaves
    gradients and the staged value+grad untouched."""
    params = _fiducial_params(model)
    obs = {"count_mesh": params["count_mesh"]}
    lat = {k: jnp.asarray(v) for k, v in params.items() if k != "count_mesh"}
    params2 = dict(params)
    params2["white_mesh_"] = params["white_mesh_"] * 0.9 + 0.05

    lp_a0 = float(jax.jit(model.logpdf)(params))
    lp_b0 = float(jax.jit(model.logpdf)(params2))
    g0 = jax.jit(jax.grad(lambda p: model.logpdf({**p, **obs})))(lat)
    try:
        zp = model.recenter_logpdf(params)
        assert zp and all(np.isfinite(v) for v in zp.values()), zp
        # at the zeroing point the recentred logpdf is ~0 by construction
        lp_a1 = float(jax.jit(model.logpdf)(params))
        assert abs(lp_a1) < 1e-3 * abs(lp_a0), (lp_a1, lp_a0)
        # same constant shift at any other point
        lp_b1 = float(jax.jit(model.logpdf)(params2))
        np.testing.assert_allclose(lp_b1 - lp_a1, lp_b0 - lp_a0,
                                   atol=2e-6 * abs(lp_b0))
        # gradients unchanged
        g1 = jax.jit(jax.grad(lambda p: model.logpdf({**p, **obs})))(lat)
        for k in g0:
            a, b = np.asarray(g0[k]), np.asarray(g1[k])
            s = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / s, a / s, atol=1e-5, err_msg=k)
        # staged value+grad applies the same zero-points
        v, g = model.value_and_grad_staged()(params)
        np.testing.assert_allclose(float(v), lp_a1, atol=1e-5 * abs(lp_a0))
    finally:
        model._lp_zero = None


def test_reparam_roundtrip(model):
    pred = model.predict(seed=1, hide_base=False, hide_det=False, hide_samp=False)
    samp_names = set().union(*model.groups_.values())
    params = {k: pred[k] for k in samp_names if k in pred}

    base = model.reparam(params)
    back = model.reparam(base, inv=True)
    for k in params:
        np.testing.assert_allclose(np.asarray(back[k]), np.asarray(params[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_reparam_matches_deterministic_sites(model):
    """Base values registered by the prior equal reparam of the sample values."""
    pred = model.predict(seed=2, hide_base=False, hide_det=False, hide_samp=False)
    samp_names = set().union(*model.groups_.values())
    params = {k: pred[k] for k in samp_names if k in pred}
    base = model.reparam(params)
    for k in ("Omega_m", "sigma8", "b1", "s_e"):
        np.testing.assert_allclose(np.asarray(base[k]), np.asarray(pred[k]),
                                   rtol=1e-5, err_msg=k)


def test_lpt_forward(lpt_model):
    pred = lpt_model.predict(seed=0, hide_det=False, hide_base=False)
    gxy = np.asarray(pred["gxy_mesh"])
    assert np.all(np.isfinite(gxy))
    np.testing.assert_allclose(gxy.mean(), 1.0, atol=0.2)


def test_lpt_logpdf_grad(lpt_model):
    full = _fiducial_params(lpt_model)
    obs = {"count_mesh": full.pop("count_mesh")}
    params = {k: jnp.asarray(v) for k, v in full.items()}
    lp, g = jax.value_and_grad(lambda p: lpt_model.logpdf({**p, **obs}))(params)
    assert np.isfinite(float(lp))
    for k, v in g.items():
        assert np.all(np.isfinite(np.asarray(v))), k


def test_condition_and_block(model):
    model2 = FieldLevelModel(**SMALL)
    pred = model2.predict(seed=0, hide_base=False, hide_det=False, hide_samp=False)
    model2.substitute({"count_mesh": pred["count_mesh"]})
    model2.block()
    tr = model2.trace(seed=3)
    # blocked: only sample-space sites remain visible
    assert "gxy_mesh" not in tr
    assert "Omega_m" not in tr
    assert "white_mesh_" in tr


def test_substitute_from_base(model):
    model2 = FieldLevelModel(**SMALL)
    model2.substitute({"Omega_m": 0.32}, from_base=True)
    assert "Omega_m_" in model2.data
    tr = model2.trace(seed=0)
    np.testing.assert_allclose(float(tr["Omega_m"]["value"]), 0.32, rtol=1e-4)


def test_save_load(tmp_path, model):
    model.save(tmp_path / "model.yaml")
    model2 = FieldLevelModel.load(tmp_path / "model.yaml")
    assert model2.final_shape == model.final_shape
    assert model2.evolution == model.evolution


def test_temperature_scaling(model):
    """Tempered model (temp_prior) still yields a finite logpdf at fiducial."""
    params = _fiducial_params(model, seed=5)
    model2 = FieldLevelModel(**SMALL)
    model2.partial(temp_prior=2.0)
    lp = float(model2.logpdf(params))
    assert np.isfinite(lp)


def test_value_and_grad_staged_parity(model):
    """Stage-split value+grad (separately-jitted evolve/likelihood programs
    with hand-chained VJPs) equals the monolithic jit(value_and_grad)."""
    params = _fiducial_params(model)
    ref_v, ref_g = jax.jit(jax.value_and_grad(model.logpdf))(params)
    v, g = model.value_and_grad_staged()(params)
    np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-5)
    for k in ref_g:
        a, b = np.asarray(ref_g[k]), np.asarray(g[k])
        s = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / s, a / s, atol=3e-5, err_msg=k)
