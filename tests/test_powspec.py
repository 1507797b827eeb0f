"""observable='powspec': multipole-spectrum likelihood with analytic
per-k-bin multipole covariance.

The reference leaves this observable as a TODO (reference model.py:60); here
it is first-class: `BlockMultivariateNormal` noise over stacked multipoles
with a Grieb+2016-style Gaussian covariance evaluated exactly on the
discrete rfft mode grid.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.random as jr

from montecosmo_tpu.models.distributions import BlockMultivariateNormal, Normal
from montecosmo_tpu.models.model import FieldLevelModel, default_config


# ======================================================================= distribution
def _random_tril(key, B, D):
    a = jr.normal(key, (B, D, D)) * 0.3
    return jnp.tril(a) + jnp.eye(D) * (1.0 + 0.2 * jnp.arange(B)[:, None, None])


def test_block_mvn_reduces_to_normal():
    """Diagonal blocks == independent Normals, elementwise."""
    key = jr.key(0)
    B, D = 5, 3
    scales = jnp.exp(jr.normal(key, (B, D)) * 0.3)
    tril = jax.vmap(jnp.diag)(scales)                     # (B, D, D)
    loc = jr.normal(jr.key(1), (D, B))
    value = jr.normal(jr.key(2), (D, B))

    d = BlockMultivariateNormal(loc, tril)
    ref = Normal(loc, scales.T)
    np.testing.assert_allclose(np.asarray(d.log_prob(value)),
                               np.asarray(ref.log_prob(value)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.variance),
                               np.asarray(ref.variance), rtol=1e-5)


def test_block_mvn_joint_density_vs_dense():
    """Summed elementwise log_prob == dense MVN log-density per block."""
    B, D = 4, 3
    tril = _random_tril(jr.key(3), B, D)
    loc = jr.normal(jr.key(4), (D, B))
    value = jr.normal(jr.key(5), (D, B))

    d = BlockMultivariateNormal(loc, tril)
    total = float(jnp.sum(d.log_prob(value)))

    expect = 0.0
    for b in range(B):
        L = np.asarray(tril[b])
        cov = L @ L.T
        dev = np.asarray(value[:, b] - loc[:, b])
        expect += (-0.5 * dev @ np.linalg.solve(cov, dev)
                   - 0.5 * np.linalg.slogdet(2 * np.pi * cov)[1])
    assert np.isclose(total, expect, rtol=1e-5)


def test_block_mvn_sample_moments():
    """Sample mean/covariance match loc / L L^T."""
    B, D = 3, 2
    tril = _random_tril(jr.key(6), B, D)
    loc = jr.normal(jr.key(7), (D, B))
    d = BlockMultivariateNormal(loc, tril)
    xs = d.sample(jr.key(8), (20000,))                    # (N, D, B)
    assert xs.shape == (20000, D, B)
    np.testing.assert_allclose(np.mean(np.asarray(xs), 0), np.asarray(loc),
                               atol=0.05)
    for b in range(B):
        cov = np.cov(np.asarray(xs[:, :, b]).T)
        L = np.asarray(tril[b])
        np.testing.assert_allclose(cov, L @ L.T, atol=0.08)


# ======================================================================= model
@pytest.fixture(scope="module")
def powspec_model():
    cfg = default_config | dict(
        final_shape=(16, 16, 16), cell_length=8.0, box_center=(0.0, 0.0, 500.0),
        evolution="lpt", observable="powspec", poles=(0, 2), a_obs=0.5,
        curved_sky=False, paint_method="scatter", init_oversamp=1.0,
        evol_oversamp=1.0, ptcl_oversamp=1.0, paint_oversamp=1.0)
    return FieldLevelModel(**cfg)


def test_powspec_static_covariance(powspec_model):
    st = powspec_model._powspec_static()
    tril = st["tril"]
    n_ell = len(powspec_model.poles)
    assert tril.shape[1:] == (n_ell, n_ell)
    assert np.all(np.isfinite(tril))
    assert np.all(np.diagonal(tril, axis1=-2, axis2=-1) > 0)
    # monopole variance decreases with k (more modes per shell)
    var0 = np.sum(tril[:, 0, :] ** 2, -1)
    assert var0[-1] < var0[0]


def test_powspec_estimator_matches_metrics(powspec_model):
    """The likelihood estimator equals metrics.spectrum on the same binning."""
    from montecosmo_tpu.metrics import spectrum

    m = powspec_model
    mesh = np.random.default_rng(0).normal(size=m.final_shape).astype(np.float32)
    est = jax.jit(m._powspec_estimate)(jnp.asarray(mesh))
    _, pows = spectrum(jnp.asarray(mesh), box_size=m.box_size,
                       ells=tuple(m.poles), kedges=m._powspec_static()["kedges"],
                       include_corners=False, los=m.los_fid)
    ref = np.stack([np.asarray(pows[int(l)]) for l in m.poles])
    np.testing.assert_allclose(np.asarray(est), ref, rtol=1e-5)


def test_powspec_white_noise_covariance(powspec_model):
    """Monopole scatter of white noise matches the analytic 2 P^2 / N_k law."""
    from montecosmo_tpu.metrics import _spectrum

    m = powspec_model
    shape, box = m.final_shape, m.box_size
    kedges = m._powspec_static()["kedges"]
    rng = np.random.default_rng(1)

    @jax.jit
    def mono(mesh):
        kcount, _, pows = _spectrum(mesh, box_size=box, ells=(0,),
                                    kedges=kedges, include_corners=False,
                                    los=m.los_fid)
        return kcount, pows[0]

    p0s = []
    for _ in range(192):
        mesh = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        kcount, p0 = mono(mesh)
        p0s.append(np.asarray(p0))
    p0s = np.stack(p0s)
    nk = np.asarray(kcount)

    pbar = np.prod(box) / np.prod(shape)  # white-noise power (Mpc/h)^3
    np.testing.assert_allclose(p0s.mean(0), pbar, rtol=0.1)
    expect_var = 2 * pbar**2 / nk
    meas_var = p0s.var(0)
    # 192 realizations: ~sqrt(2/192) ~ 10% sampling error on the variance
    np.testing.assert_allclose(meas_var, expect_var, rtol=0.45)


def test_powspec_predict_logpdf_grad(powspec_model):
    """End to end: predict a powspec draw, condition, logpdf + grad finite."""
    m = powspec_model
    pred = m.predict(seed=0, hide_det=False, hide_base=False)
    ps = pred["powspec"]
    assert ps.shape == (len(m.poles), len(m._powspec_static()["kmean"]))
    assert np.all(np.isfinite(np.asarray(ps)))

    m.reset()
    m.substitute({"powspec": ps})
    samp = {k: v for k, v in pred.items() if k.endswith("_")}
    lp, g = jax.jit(jax.value_and_grad(m.logpdf))(samp)
    assert np.isfinite(float(lp))
    for k, v in g.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    m.reset()


def test_powspec_obs_data_selfconsistent(powspec_model):
    """obs_data() prefers an assigned powspec_data draw."""
    m = powspec_model
    fake = jnp.ones((len(m.poles), len(m._powspec_static()["kmean"])))
    m.powspec_data = fake
    assert m.obs_data()["powspec"] is fake
    m.powspec_data = None
