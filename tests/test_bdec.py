"""Weighted quantiles and credible sets."""
import numpy as np
from jax import numpy as jnp

from montecosmo_tpu.bdec import (
    credint, cumulative_trapezoid, qbci, qbcs, quantile, sci, sci_noweights,
)


def test_quantile_unweighted_matches_numpy(rng):
    x = jnp.asarray(rng.standard_normal(5000))
    for p in (0.1, 0.5, 0.9):
        q = float(quantile(x, p))
        np.testing.assert_allclose(q, np.quantile(np.asarray(x), p), atol=0.02)


def test_quantile_weighted(rng):
    """Weighting by 2x on half the samples ~ duplicating them."""
    x = jnp.concatenate([jnp.zeros(100), jnp.ones(100)])
    w = jnp.concatenate([2 * jnp.ones(100), jnp.ones(100)])
    q = float(quantile(x, 0.5, weights=w))
    assert q < 0.5  # median pulled toward the heavier zeros


def test_quantile_ord2_density(rng):
    """ord=2 density quantiles: weights = pdf values on a grid recover the
    distribution quantiles."""
    xs = jnp.linspace(-6, 6, 2001)
    pdf = jnp.exp(-0.5 * xs**2)
    from scipy.stats import norm
    for p in (0.25, 0.5, 0.84):
        q = float(quantile(xs, p, weights=pdf, ord=2))
        np.testing.assert_allclose(q, norm.ppf(p), atol=0.02)


def test_qbci_equal_tail(rng):
    x = jnp.asarray(rng.standard_normal(20000))
    lo, hi = np.asarray(qbci(x, 0.9, type="med"))
    np.testing.assert_allclose([lo, hi], [-1.645, 1.645], atol=0.08)


def test_sci_hdi_on_skewed(rng):
    """HDI of a skewed distribution is shorter than the equal-tail interval."""
    x = jnp.asarray(rng.gamma(2.0, size=20000))
    hdi = np.asarray(sci_noweights(x, 0.9))
    et = np.asarray(qbci(x, 0.9, type="med"))
    assert hdi[1] - hdi[0] < et[1] - et[0]
    # weighted jittable version agrees with the unweighted one
    hdi_w = np.asarray(sci(x, 0.9, weights=jnp.ones_like(x))).squeeze()
    np.testing.assert_allclose(hdi_w, hdi, atol=0.15)


def test_credint_dispatch(rng):
    x = jnp.asarray(rng.standard_normal(5000))
    a = np.asarray(credint(x, 0.68, type="small"))
    b = np.asarray(credint(x, 0.68, type="med"))
    assert a.shape[-1] == 2 and b.shape[-1] == 2


def test_qbcs(rng):
    x = jnp.asarray(rng.standard_normal((5000, 3)))
    center, radius = qbcs(x, 0.9, type="med")
    np.testing.assert_allclose(np.asarray(center), 0.0, atol=0.06)
    assert float(radius) > 1.5  # inf-norm ball of 3 gaussians


def test_cumulative_trapezoid():
    xs = jnp.linspace(0, 1, 101)
    ys = 2 * xs
    integral = cumulative_trapezoid(ys, xs, initial=0)
    np.testing.assert_allclose(np.asarray(integral), np.asarray(xs) ** 2,
                               atol=1e-4)


def test_scs_gaussian_2d():
    """p-HDR of a standard 2-D normal: mass above the level ~ p, level near
    the analytic (1-p)/(2 pi)."""
    from montecosmo_tpu.bdec import scs

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4000, 2)).astype(np.float32))
    axes, mesh, level = scs(x, p=0.95)
    dx = float(axes[0][1] - axes[0][0])
    dy = float(axes[1][1] - axes[1][0])
    mass = float(jnp.sum(jnp.where(mesh >= level, mesh, 0.0)) * dx * dy)
    assert 0.90 <= mass <= 0.97, mass
    exact = (1 - 0.95) / (2 * np.pi)
    assert 0.6 < float(level) / exact < 1.6  # KDE-bias tolerance


def test_scs_weighted_1d():
    """Weighted 1-D samples: the HDR of a half-weighted bimodal mixture
    keeps both modes above level."""
    from montecosmo_tpu.bdec import scs

    rng = np.random.default_rng(1)
    a = rng.normal(-3.0, 0.5, 2000)
    b = rng.normal(3.0, 0.5, 2000)
    x = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    w = jnp.ones(4000)
    axes, mesh, level = scs(x, p=0.9, weights=w)
    dens = np.asarray(mesh)
    grid = np.asarray(axes[0])
    above = grid[dens >= float(level)]
    assert (above < 0).any() and (above > 0).any()      # both modes in set
    assert not ((above > -1.5) & (above < 1.5)).any()   # valley excluded
