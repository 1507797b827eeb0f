"""Spectrum estimator and chain diagnostics."""
import numpy as np
import jax
from jax import numpy as jnp, random as jr

from montecosmo_tpu.metrics import (
    coherence, effective_sample_size, gelman_rubin, kaiser_formula, multi_ess,
    multi_gr, naive_mu2_delta, optim_mu2_delta, powtranscoh, spectrum, transfer,
)
from montecosmo_tpu.ops.background import Background, Planck18
from montecosmo_tpu.ops.hermitian import rg2cgh
from montecosmo_tpu.ops.power import lin_power_mesh

SHAPE = (32, 32, 32)
BOX = np.full(3, 320.0)


def make_field(rng, cosmo=None):
    cosmo = cosmo or Planck18()
    white = rg2cgh(jnp.asarray(rng.standard_normal(SHAPE), jnp.float32))
    pmesh = lin_power_mesh(cosmo, SHAPE, BOX)
    cell_vol = np.prod(BOX / np.asarray(SHAPE))
    return jnp.fft.irfftn(white * (pmesh / cell_vol) ** 0.5), cosmo


def test_spectrum_recovers_input_power(rng):
    """Measured P(k) of a Gaussian realization matches the input spectrum."""
    from montecosmo_tpu.ops.power import lin_power_interp

    delta, cosmo = make_field(rng)
    ks, pows = spectrum(delta, box_size=BOX)
    expect = lin_power_interp(cosmo)(jnp.asarray(ks))
    ratio = np.asarray(pows / expect)
    # cosmic-variance-limited at low k: compare the mid-k bins
    assert np.abs(np.log(ratio[2:-2])).mean() < 0.3, ratio


def test_white_noise_flat_power(rng):
    x = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    ks, pows = spectrum(x, box_size=BOX)
    cell_vol = np.prod(BOX / np.asarray(SHAPE))
    np.testing.assert_allclose(np.asarray(pows).mean(), cell_vol, rtol=0.1)


def test_transfer_and_coherence(rng):
    delta, _ = make_field(rng)
    ks, t = transfer(delta, 2.0 * delta, BOX)
    np.testing.assert_allclose(np.asarray(t), 2.0, rtol=1e-4)
    ks, c = coherence(delta, 2.0 * delta, BOX)
    np.testing.assert_allclose(np.asarray(c), 1.0, rtol=1e-4)

    ks, p, t, c = powtranscoh(delta, delta, BOX)
    np.testing.assert_allclose(np.asarray(t), 1.0, rtol=1e-5)


def test_spectrum_multipoles(rng):
    delta, _ = make_field(rng)
    ks, pows = spectrum(delta, box_size=BOX, box_center=(0, 0, 1000.0),
                        ells=[0, 2, 4])
    # isotropic field: quadrupole/hexadecapole consistent with zero
    assert np.abs(np.asarray(pows[2]) / np.asarray(pows[0])).mean() < 0.5


def test_mu2_operators_agree(rng):
    """Curved-sky mu^2 operators: 8-FFT naive vs 6-FFT Y_2m decomposition."""
    from jax.scipy.spatial.transform import Rotation
    from montecosmo_tpu.models.bricks import pos_mesh
    from montecosmo_tpu.utils.safe import safe_div

    delta, _ = make_field(rng)
    # per-cell line-of-sight field for a box far from the observer
    pos = pos_mesh((0.0, 0.0, 3000.0), Rotation.from_rotvec(jnp.zeros(3)),
                   BOX, SHAPE)
    los = safe_div(pos, jnp.linalg.norm(pos, axis=-1, keepdims=True))
    mu2a = naive_mu2_delta(jnp.fft.rfftn(delta), los)
    _, mu2b = optim_mu2_delta(jnp.fft.rfftn(delta), los)
    np.testing.assert_allclose(np.asarray(mu2a), np.asarray(mu2b),
                               atol=0.02 * float(jnp.abs(mu2a).max()))


def test_kaiser_formula_monopole():
    cosmo = Planck18()
    bg = Background.create(cosmo)
    k = jnp.logspace(-2, 0, 16)
    pows = jnp.ones(16)
    ks, pk = kaiser_formula(bg, 1.0, (k, pows), b1E=2.0, ells=[0])
    beta = float(bg.a2f(1.0)) / 2.0
    expect = 4.0 * (1 + 2 * beta / 3 + beta**2 / 5)
    np.testing.assert_allclose(np.asarray(pk)[..., 0, :], expect, rtol=1e-5)


def test_ess_iid(rng):
    x = jnp.asarray(rng.standard_normal((4, 1000)))
    ess = float(effective_sample_size(x))
    assert 2000 < ess < 8000, ess  # ~ n_total for iid


def test_ess_correlated(rng):
    """AR(1) chain: ESS ~ n (1-rho)/(1+rho)."""
    rho = 0.9
    n = 4000
    eps = rng.standard_normal((2, n))
    x = np.zeros((2, n))
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * eps[:, t]
    ess = float(effective_sample_size(jnp.asarray(x)))
    expect = 2 * n * (1 - rho) / (1 + rho)
    assert 0.3 * expect < ess < 3 * expect, (ess, expect)


def test_gelman_rubin(rng):
    good = jnp.asarray(rng.standard_normal((4, 500)))
    assert abs(float(gelman_rubin(good)) - 1.0) < 0.05
    bad = good + jnp.arange(4.0)[:, None] * 3  # separated chains
    assert float(gelman_rubin(bad)) > 1.5


def test_multi_diagnostics(rng):
    x = jnp.asarray(rng.standard_normal((4, 500, 3)))
    assert np.isfinite(float(multi_ess(x)))
    assert abs(float(multi_gr(x)) - 1.0) < 0.1


def test_wigner3j_square_legendre_linearization():
    """Coefficients reproduce direct Legendre polynomial multiplication."""
    from numpy.polynomial import legendre as npleg

    from montecosmo_tpu.metrics import wigner3j_square

    for lo, li in [(0, 0), (1, 1), (2, 2), (4, 2), (2, 4), (6, 4)]:
        prod = npleg.legmul([0] * lo + [1], [0] * li + [1])
        ells, coeffs = wigner3j_square(lo, li, prefactor=False)
        expect = [prod[L] if L < len(prod) else 0.0 for L in ells]
        np.testing.assert_allclose(coeffs, expect, atol=1e-12)
        np.testing.assert_allclose(sum(coeffs), 1.0, rtol=1e-12)  # P_l(1)=1
    # window prefactor convention: (2 ellout + 1) / (2 L + 1)
    ells, with_pref = wigner3j_square(2, 2, prefactor=True)
    _, plain = wigner3j_square(2, 2, prefactor=False)
    np.testing.assert_allclose(
        with_pref, [5.0 / (2 * L + 1) * c for L, c in zip(ells, plain)])


def test_distr_angular():
    """Equal-area angular binning: an isotropic shell gives a flat per-
    steradian density; a +z point source lands in the top costheta row."""
    from montecosmo_tpu.metrics import distr_angular

    rng = np.random.default_rng(3)
    u = rng.normal(size=(40000, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    pos = u * rng.uniform(50.0, 100.0, size=(40000, 1))
    mesh = np.ones(len(pos))

    count, (cost_c, phi_c), dens = distr_angular(mesh, pos, n_costheta=4,
                                                 n_phi=8)
    assert count.sum() == 40000 and len(count) == 32
    # isotropy: every equal-area bin within ~6 sigma Poisson of the mean
    expect = 40000 / (4 * np.pi)
    assert np.all(np.abs(dens - expect) < 6 * np.sqrt(expect * 32 / (4 * np.pi))), dens
    assert cost_c.min() == -0.75 and cost_c.max() == 0.75

    # point source at +z: all mass in one top-row bin
    src = np.asarray([[0.0, 0.0, 70.0]] * 10)
    count, (cost_c, _), dens = distr_angular(np.full(10, 2.0), src,
                                             n_costheta=4, n_phi=8)
    assert len(count) == 1 and count[0] == 10
    assert cost_c[0] == 0.75
    np.testing.assert_allclose(dens[0], 20.0 / (4 * np.pi / 32))
