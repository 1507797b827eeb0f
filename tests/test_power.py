"""Linear power spectrum: normalization, shape, differentiability."""
import numpy as np
import jax
from jax import numpy as jnp

from montecosmo_tpu.ops.background import Planck18, get_cosmology, Background
from montecosmo_tpu.ops.power import (
    eisenstein_hu_transfer, lin_power, lin_power_interp, lin_power_mesh, _sigma_r,
)


def test_transfer_normalized_at_low_k():
    t = eisenstein_hu_transfer(Planck18(), jnp.array([1e-5, 1e-4]))
    np.testing.assert_allclose(np.asarray(t), 1.0, rtol=2e-2)


def test_transfer_decreases():
    k = jnp.logspace(-3, 1, 64)
    t = np.asarray(eisenstein_hu_transfer(Planck18(), k))
    assert t[0] > 0.95 and t[-1] < 1e-3
    assert np.all(t > 0)


def test_sigma8_normalization():
    cosmo = Planck18()
    pow_fn = lin_power_interp(cosmo)
    s8 = float(_sigma_r(cosmo, pow_fn))
    np.testing.assert_allclose(s8, float(cosmo.sigma8), rtol=1e-3)


def test_power_peak_location():
    """P(k) peaks at the matter-radiation equality scale ~ 0.015 h/Mpc."""
    ks, pows = lin_power(Planck18())
    kpeak = float(ks[np.argmax(np.asarray(pows))])
    assert 0.005 < kpeak < 0.05, kpeak


def test_kpow_table_scaling():
    ks = np.logspace(-3, 0, 32)
    base = np.ones(32)
    cosmo = get_cosmology(Omega_m=0.31, sigma8=0.9)
    _, pows = lin_power(cosmo, kpow=(ks, base))
    np.testing.assert_allclose(np.asarray(pows), 0.81, rtol=1e-6)


def test_power_growth_scaling():
    cosmo = Planck18()
    bg = Background.create(cosmo)
    ks, p1 = lin_power(cosmo, a=1.0)
    ks, p5 = lin_power(cosmo, a=0.5, bg=bg)
    ratio = np.asarray(p5 / p1)
    np.testing.assert_allclose(ratio, float(bg.a2g(0.5)) ** 2, rtol=1e-5)


def test_power_mesh_and_grad():
    def mean_power(om):
        cosmo = get_cosmology(Omega_m=om, sigma8=0.8)
        return lin_power_mesh(cosmo, (8, 8, 8), (400.0, 400.0, 400.0)).mean()

    g = jax.grad(mean_power)(jnp.asarray(0.31))
    assert np.isfinite(g)
