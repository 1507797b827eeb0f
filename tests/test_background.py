"""Background cosmology: growth/distance tables vs analytic limits."""
import numpy as np
import jax
from jax import numpy as jnp

from montecosmo_tpu.ops.background import (
    AbacusSummit0, Background, Cosmology, Planck18, Esqr, RH, get_cosmology,
)


def eds_cosmo():
    # Einstein-de-Sitter: Omega_m = 1, no curvature/DE
    return Cosmology(Omega_c=0.95, Omega_b=0.05, h=0.7, n_s=1.0, sigma8=0.8)


def test_eds_growth_is_scale_factor():
    bg = Background.create(eds_cosmo())
    a = jnp.array([0.1, 0.3, 0.5, 1.0])
    np.testing.assert_allclose(bg.a2g(a), a, rtol=2e-3)
    np.testing.assert_allclose(bg.a2f(a), 1.0, rtol=2e-3)
    # D2 = -3/7 a^2 in EdS
    np.testing.assert_allclose(bg.a2g2(a), -3 / 7 * a**2, rtol=5e-3)
    np.testing.assert_allclose(bg.a2f2(a), 2.0, rtol=5e-3)


def test_eds_distance():
    bg = Background.create(eds_cosmo())
    a = jnp.array([0.25, 0.5, 0.9])
    chi_analytic = 2 * RH * (1 - jnp.sqrt(a))
    np.testing.assert_allclose(bg.a2chi(a), chi_analytic, rtol=2e-3)


def test_growth_inverse_lookups():
    bg = Background.create(Planck18())
    a = jnp.array([0.2, 0.5, 0.8])
    np.testing.assert_allclose(bg.g2a(bg.a2g(a)), a, rtol=1e-4)
    chi = bg.a2chi(a)
    np.testing.assert_allclose(bg.chi2a(chi), a, rtol=1e-4)


def test_lcdm_growth_values():
    """Planck18 growth suppression: D(a=0.5)/a(=0.5) ~ 1.22-1.3 ballpark,
    f(a=1) ~ Omega_m(1)^0.55."""
    cosmo = Planck18()
    bg = Background.create(cosmo)
    f1 = float(bg.a2f(1.0))
    expect = float(cosmo.Omega_m**0.55)
    assert abs(f1 - expect) < 0.01, (f1, expect)
    d05 = float(bg.a2g(0.5))
    assert 0.55 < d05 < 0.65, d05


def test_background_is_differentiable():
    def growth_at_half(om):
        cosmo = get_cosmology(Omega_m=om, sigma8=0.8)
        return Background.create(cosmo).a2g(0.5)

    g = jax.grad(growth_at_half)(jnp.asarray(0.31))
    assert np.isfinite(g)
    # higher Omega_m -> closer to EdS (D ~ a): D(0.5)/D(1) decreases
    assert float(g) < 0


def test_background_jits():
    f = jax.jit(lambda om: Background.create(
        get_cosmology(Omega_m=om, sigma8=0.8)).a2chi(0.5))
    assert np.isfinite(float(f(0.31)))


def test_background_as_jit_argument():
    """A Background passed ACROSS the jit boundary (traced tables) must give
    the same lookups as the in-trace path — the node grid is reconstructed
    from the static table length, not searchsorted over traced values."""
    bg = Background.create(AbacusSummit0())
    a = jnp.asarray([1e-3, 0.013, 0.31, 0.57, 1.0])

    lookups = jax.jit(lambda b, a: (b.a2g(a), b.a2f(a), b.a2g2(a), b.a2chi(a)))
    got = lookups(bg, a)
    want = (bg.a2g(a), bg.a2f(a), bg.a2g2(a), bg.a2chi(a))
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        # grid nodes are reconstructed in f64 vs the stored f32 tables:
        # agreement is to f32 roundoff, relative to the table scale
        np.testing.assert_allclose(g, w, rtol=2e-5,
                                   atol=1e-5 * np.abs(w).max())
