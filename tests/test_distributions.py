"""Distribution correctness: moments, normalization, cdf consistency.

Hermetic version of the reference's `tests/test_shash.py` and
`tests/plot_gxy_stoch.py` validation content.
"""
import numpy as np
import jax
from jax import numpy as jnp, random as jr
from scipy import stats as sps

from montecosmo_tpu.models.distributions import (
    CubGaussian, DetruncTruncNorm, DetruncUnif, Normal, Poisson, QuadGaussian,
    SinhArcsinh, SkewNormal, TruncatedNormal, TwoQuadGaussian, Uniform,
    match_quadratic_gaussian,
)
from montecosmo_tpu.models.truncnorm import std2trunc, trunc2std

KEY = jr.key(0)
N = 40000


def check_moments(dist, mean, var, key=KEY, n=N, rtol=0.08):
    x = np.asarray(dist.sample(key, (n,)))
    np.testing.assert_allclose(x.mean(), mean, atol=rtol * max(np.sqrt(var), 0.1))
    np.testing.assert_allclose(x.var(), var, rtol=3 * rtol)


def check_logprob_normalized(dist, lo, hi, n=4001, rtol=2e-2):
    xs = jnp.linspace(lo, hi, n)
    p = np.exp(np.asarray(dist.log_prob(xs)))
    integral = np.trapezoid(p, np.asarray(xs))
    np.testing.assert_allclose(integral, 1.0, rtol=rtol)


def check_cdf_consistent(dist, lo, hi, n=2001, atol=2e-3):
    """cdf' == pdf (numerically)."""
    xs = np.linspace(lo, hi, n)
    cdf = np.asarray(dist.cdf(jnp.asarray(xs)))
    pdf = np.exp(np.asarray(dist.log_prob(jnp.asarray(xs))))
    dcdf = np.gradient(cdf, xs)
    np.testing.assert_allclose(dcdf, pdf, atol=atol + 0.02 * pdf.max())


def test_normal():
    d = Normal(1.5, 2.0)
    check_moments(d, 1.5, 4.0)
    check_logprob_normalized(d, -10, 13)
    np.testing.assert_allclose(float(d.cdf(1.5)), 0.5, atol=1e-6)


def test_uniform():
    d = Uniform(-1.0, 3.0)
    check_moments(d, 1.0, 16 / 12)
    check_logprob_normalized(d, -1.0, 3.0)


def test_truncated_normal_vs_scipy():
    loc, scale, low, high = 1.0, 2.0, -1.0, 2.5
    d = TruncatedNormal(loc, scale, low, high)
    ref = sps.truncnorm((low - loc) / scale, (high - loc) / scale, loc, scale)
    xs = np.linspace(-0.9, 2.4, 50)
    np.testing.assert_allclose(np.asarray(d.log_prob(jnp.asarray(xs))),
                               ref.logpdf(xs), rtol=1e-4, atol=1e-5)
    x = np.asarray(d.sample(KEY, (N,)))
    assert (x >= low).all() and (x <= high).all()
    np.testing.assert_allclose(x.mean(), ref.mean(), atol=0.02)


def test_poisson():
    d = Poisson(4.5)
    x = np.asarray(d.sample(KEY, (N,)))
    np.testing.assert_allclose(x.mean(), 4.5, rtol=0.03)
    np.testing.assert_allclose(x.var(), 4.5, rtol=0.05)
    ks = jnp.arange(30.0)
    np.testing.assert_allclose(np.asarray(d.log_prob(ks)),
                               sps.poisson(4.5).logpmf(np.arange(30)), rtol=1e-5)


def test_std2trunc_roundtrip():
    xs = jnp.linspace(-5, 5, 41)
    ys = std2trunc(xs, 1.0, 0.5, 0.0, 3.0)
    assert float(ys.min()) > 0.0 and float(ys.max()) < 3.0
    back = trunc2std(ys, 1.0, 0.5, 0.0, 3.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xs), rtol=1e-3, atol=1e-3)


def test_std2trunc_pushforward_distribution():
    """std2trunc(N(0,1)) has exactly the TruncatedNormal distribution."""
    z = jr.normal(KEY, (N,))
    y = np.asarray(std2trunc(z, 1.0, 2.0, -1.0, 2.5))
    ref = sps.truncnorm((-1 - 1) / 2, (2.5 - 1) / 2, 1.0, 2.0)
    ks = sps.kstest(y, ref.cdf)
    assert ks.pvalue > 1e-3, ks


def test_detrunc_truncnorm():
    """std2trunc(DetruncTruncNorm(...)) ~ TruncNormal(loc, scale, low, high)."""
    d = DetruncTruncNorm(1.0, 0.7, 0.0, 3.0, loc_fid=1.2, scale_fid=0.5)
    x = d.sample(KEY, (N,))
    y = np.asarray(std2trunc(x, 1.2, 0.5, 0.0, 3.0))
    ref = sps.truncnorm((0 - 1) / 0.7, (3 - 1) / 0.7, 1.0, 0.7)
    ks = sps.kstest(y, ref.cdf)
    assert ks.pvalue > 1e-3, ks
    check_logprob_normalized(d, -12, 12)


def test_detrunc_unif():
    d = DetruncUnif(0.0, 2.0)
    x = d.sample(KEY, (N,))
    y = np.asarray(std2trunc(x, *np.asarray([(2 + 0) / 2, 2 / 12**0.5]), 0.0, 2.0))
    ks = sps.kstest(y, sps.uniform(0, 2).cdf)
    assert ks.pvalue > 1e-3, ks
    check_logprob_normalized(d, -12, 12)


def test_shash_moments_are_exact():
    """SHASH standardization: loc/scale ARE the mean/std for any shape."""
    d = SinhArcsinh(2.0, 1.5, skewness=0.5, tailweight=1.3)
    x = np.asarray(d.sample(KEY, (4 * N,)))
    np.testing.assert_allclose(x.mean(), 2.0, atol=0.05)
    np.testing.assert_allclose(x.std(), 1.5, rtol=0.05)
    check_logprob_normalized(d, -30, 40)
    check_cdf_consistent(d, -5, 9)


def test_shash_reduces_to_normal():
    d = SinhArcsinh(0.5, 2.0, 0.0, 1.0)
    xs = jnp.linspace(-6, 7, 31)
    np.testing.assert_allclose(np.asarray(d.log_prob(xs)),
                               np.asarray(Normal(0.5, 2.0).log_prob(xs)),
                               rtol=1e-4, atol=1e-5)


def test_quad_gaussian():
    d = QuadGaussian(1.0, 1.0, 0.3)
    check_moments(d, 1.0, 1.0 + 2 * 0.09)
    check_logprob_normalized(d, -6, 10)
    # density diverges at the support boundary loc - s2 - s1^2/(4 s2) = -0.133:
    # check cdf' == pdf away from it
    check_cdf_consistent(d, 0.2, 6)
    # third moment: 2 s2 (3 s1^2 + 4 s2^2)
    x = np.asarray(d.sample(KEY, (8 * N,)))
    m3 = ((x - x.mean()) ** 3).mean()
    np.testing.assert_allclose(m3, 2 * 0.3 * (3 + 4 * 0.09), rtol=0.15)


def test_quad_gaussian_scale2_zero_is_normal():
    d = QuadGaussian(0.0, 1.3, 0.0)
    xs = jnp.linspace(-5, 5, 21)
    np.testing.assert_allclose(np.asarray(d.log_prob(xs)),
                               np.asarray(Normal(0.0, 1.3).log_prob(xs)), rtol=1e-5)


def test_two_quad_gaussian():
    d = TwoQuadGaussian(0.0, 1.0, 0.3)
    check_moments(d, 0.0, 1.0 + 2 * 0.09)
    check_logprob_normalized(d, -8, 8)
    # third moment: 8 s2^3 (no cross term)
    x = np.asarray(d.sample(KEY, (8 * N,)))
    m3 = ((x - x.mean()) ** 3).mean()
    np.testing.assert_allclose(m3, 8 * 0.3**3, atol=0.03)


def test_skew_normal():
    d = SkewNormal(1.0, 2.0, 0.5)
    x = np.asarray(d.sample(KEY, (4 * N,)))
    np.testing.assert_allclose(x.mean(), 1.0, atol=0.05)
    np.testing.assert_allclose(x.std(), 2.0, rtol=0.03)
    skew = ((x - x.mean()) ** 3).mean() / x.std() ** 3
    np.testing.assert_allclose(skew, 0.5, atol=0.06)
    check_logprob_normalized(d, -10, 12)
    check_cdf_consistent(d, -6, 8)


def test_match_quadratic_gaussian():
    m, s, g = match_quadratic_gaussian(1.0, 1.0, 0.2)
    qd = QuadGaussian(1.0, 1.0, 0.2)
    np.testing.assert_allclose(float(m), 1.0)
    np.testing.assert_allclose(float(s), float(jnp.sqrt(qd.variance)), rtol=1e-6)


def test_cub_gaussian():
    d = CubGaussian(0.0, 1.0, 0.2, 0.05)
    check_logprob_normalized(d, -10, 10)
    x = np.asarray(d.sample(KEY, (4 * N,)))
    np.testing.assert_allclose(x.mean(), 0.0, atol=0.03)
    # s3 -> 0 reduces to QuadGaussian
    d0 = CubGaussian(0.0, 1.0, 0.2, 0.0)
    xs = jnp.linspace(-3, 4, 21)
    np.testing.assert_allclose(np.asarray(d0.log_prob(xs)),
                               np.asarray(QuadGaussian(0.0, 1.0, 0.2).log_prob(xs)),
                               rtol=1e-4)


def test_distributions_differentiable():
    for make in (lambda s: Normal(0.0, s), lambda s: QuadGaussian(0.0, s, 0.1),
                 lambda s: SinhArcsinh(0.0, s, 0.3, 1.1),
                 lambda s: SkewNormal(0.0, s, 0.3)):
        g = jax.grad(lambda s: make(s).log_prob(0.7).sum())(jnp.asarray(1.0))
        assert np.isfinite(float(g)), make
