"""Probability distributions for the field-level model.

Standard families (Normal, Uniform, TruncatedNormal, Poisson) plus the
reference's custom field-level noise models and detruncated priors:

* DetruncTruncNorm / DetruncUnif — priors in unconstrained sample space whose
  push-forward through `std2trunc` is TruncatedNormal / Uniform
  (parity: utils.py:267-353),
* SinhArcsinh — moment-standardized SHASH (utils.py:392-464),
* QuadGaussian — obs = loc + s1 e + s2 (e^2-1), exact 2-preimage density
  (utils.py:474-538),
* TwoQuadGaussian — independent-noise variant, Gauss-Hermite density
  (utils.py:541-635),
* SkewNormal — centered-parametrization Azzalini with Owen's-T cdf
  (utils.py:645-748),
* CubGaussian — cubic-Hermite noise with Cardano-root density (the reference
  keeps it in tests/plot_gxy_stoch.py:19-140; here it is first-class).

All distributions are plain objects constructed inside traced code: methods
are pure jnp, shapes broadcast, log_cdf is provided wherever the likelihood
layer needs per-voxel cumulative densities.
"""
from functools import partial

import numpy as np
from jax import grad, lax, numpy as jnp, random as jr
from jax.scipy.special import gammaln, logsumexp, xlogy
from jax.scipy.stats import norm
from numpy.polynomial.hermite_e import hermegauss
from numpy.polynomial.legendre import leggauss

from montecosmo_tpu.models.truncnorm import std2trunc, trunc2std
from montecosmo_tpu.utils.safe import nvmap


def _log1mexp(x):
    """Stable log(1 - exp(x)) for x <= 0."""
    return jnp.where(x > -jnp.log(2.0),
                     jnp.log(-jnp.expm1(x)),
                     jnp.log1p(-jnp.exp(x)))


def _log_diff_cdf(hi, lo):
    """log(Phi(hi) - Phi(lo)) for hi >= lo, evaluated on the accurate tail."""
    use_upper = (hi + lo) > 0
    lower = norm.logcdf(hi) + _log1mexp(norm.logcdf(lo) - norm.logcdf(hi))
    upper = norm.logcdf(-lo) + _log1mexp(norm.logcdf(-hi) - norm.logcdf(-lo))
    return jnp.where(use_upper, upper, lower)


class Distribution:
    """Minimal distribution interface: sample / log_prob (+ cdf/log_cdf)."""

    def sample(self, key, sample_shape=()):
        raise NotImplementedError

    def log_prob(self, value):
        raise NotImplementedError

    @property
    def batch_shape(self):
        return ()


# ======================================================================= standard
class Normal(Distribution):
    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    def sample(self, key, sample_shape=()):
        eps = jr.normal(key, sample_shape + self.batch_shape)
        return self.loc + self.scale * eps

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * z**2 - jnp.log(self.scale) - 0.5 * jnp.log(2 * jnp.pi)

    def cdf(self, value):
        return norm.cdf((value - self.loc) / self.scale)

    def log_cdf(self, value):
        return norm.logcdf((value - self.loc) / self.scale)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(jnp.square(self.scale), self.batch_shape)


class Uniform(Distribution):
    def __init__(self, low=0.0, high=1.0):
        self.low, self.high = low, high

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.low), jnp.shape(self.high))

    def sample(self, key, sample_shape=()):
        u = jr.uniform(key, sample_shape + self.batch_shape)
        return self.low + (self.high - self.low) * u

    def log_prob(self, value):
        inside = (self.low <= value) & (value <= self.high)
        return jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)

    def cdf(self, value):
        return jnp.clip((value - self.low) / (self.high - self.low), 0.0, 1.0)

    def log_cdf(self, value):
        return jnp.log(self.cdf(value))


class TruncatedNormal(Distribution):
    def __init__(self, loc=0.0, scale=1.0, low=-jnp.inf, high=jnp.inf):
        self.loc, self.scale, self.low, self.high = loc, scale, low, high

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(*(jnp.shape(x) for x in
                                      (self.loc, self.scale, self.low, self.high)))

    def sample(self, key, sample_shape=()):
        eps = jr.normal(key, sample_shape + self.batch_shape)
        args = jnp.broadcast_arrays(eps, jnp.asarray(self.loc, float),
                                    jnp.asarray(self.scale, float),
                                    jnp.asarray(self.low, float),
                                    jnp.asarray(self.high, float))
        return nvmap(std2trunc, args[0].ndim)(*args)

    def log_prob(self, value):
        a = (self.low - self.loc) / self.scale
        b = (self.high - self.loc) / self.scale
        z = (value - self.loc) / self.scale
        log_norm = _log_diff_cdf(jnp.asarray(b, float), jnp.asarray(a, float))
        lp = norm.logpdf(z) - jnp.log(self.scale) - log_norm
        inside = (self.low <= value) & (value <= self.high)
        return jnp.where(inside, lp, -jnp.inf)


class Poisson(Distribution):
    def __init__(self, rate):
        self.rate = rate

    @property
    def batch_shape(self):
        return jnp.shape(self.rate)

    def sample(self, key, sample_shape=()):
        return jr.poisson(key, self.rate, sample_shape + self.batch_shape).astype(float)

    def log_prob(self, value):
        return xlogy(value, self.rate) - self.rate - gammaln(value + 1)

    def log_cdf(self, value):
        # regularized upper incomplete gamma Q(floor(v)+1, rate)
        from jax.scipy.special import gammaincc
        return jnp.log(jnp.clip(gammaincc(jnp.floor(value) + 1, self.rate),
                                1e-300, 1.0))

    def cdf(self, value):
        return jnp.exp(self.log_cdf(value))

    @property
    def mean(self):
        return self.rate

    @property
    def variance(self):
        return self.rate


# ======================================================================= detruncated priors
class DetruncTruncNorm(Distribution):
    """Prior in sample space whose push-forward through
    `std2trunc(., loc_fid, scale_fid, low, high)` is
    TruncatedNormal(loc, scale, low, high)."""

    def __init__(self, loc=0.0, scale=1.0, low=-jnp.inf, high=jnp.inf,
                 loc_fid=None, scale_fid=None):
        self.loc, self.scale, self.low, self.high = loc, scale, low, high
        self.loc_fid = loc if loc_fid is None else loc_fid
        self.scale_fid = scale if scale_fid is None else scale_fid

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(*(jnp.shape(x) for x in
                                      (self.loc, self.scale, self.low, self.high,
                                       self.loc_fid, self.scale_fid)))

    def sample(self, key, sample_shape=()):
        base = TruncatedNormal(self.loc, self.scale, self.low, self.high)
        y = base.sample(key, sample_shape)
        args = jnp.broadcast_arrays(y, jnp.asarray(self.loc_fid, float),
                                    jnp.asarray(self.scale_fid, float),
                                    jnp.asarray(self.low, float),
                                    jnp.asarray(self.high, float))
        return nvmap(trunc2std, args[0].ndim)(*args)

    def _log_prob_scalar(self, value, loc, scale, low, high, loc_fid, scale_fid):
        push = partial(std2trunc, loc=loc_fid, scale=scale_fid, low=low, high=high)
        # floor: far beyond the bounds the soft-tail slope underflows to 0 in
        # f32; log(0) would poison sampler gradients with NaNs
        ladj = jnp.log(jnp.abs(grad(push)(value)) + 1e-30)
        return TruncatedNormal(loc, scale, low, high).log_prob(push(value)) + ladj

    def log_prob(self, value):
        args = jnp.broadcast_arrays(value, *(jnp.asarray(x, float) for x in
                                             (self.loc, self.scale, self.low, self.high,
                                              self.loc_fid, self.scale_fid)))
        return nvmap(self._log_prob_scalar, args[0].ndim)(*args)


class DetruncUnif(Distribution):
    """Prior in sample space whose push-forward through
    `std2trunc(., loc_fid, scale_fid, low, high)` is Uniform(low, high)."""

    def __init__(self, low=0.0, high=1.0, loc_fid=None, scale_fid=None):
        self.low, self.high = low, high
        self.loc_fid = (high + low) / 2 if loc_fid is None else loc_fid
        self.scale_fid = (high - low) / 12**0.5 if scale_fid is None else scale_fid

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(*(jnp.shape(x) for x in
                                      (self.low, self.high, self.loc_fid,
                                       self.scale_fid)))

    def sample(self, key, sample_shape=()):
        y = Uniform(self.low, self.high).sample(key, sample_shape)
        args = jnp.broadcast_arrays(y, jnp.asarray(self.loc_fid, float),
                                    jnp.asarray(self.scale_fid, float),
                                    jnp.asarray(self.low, float),
                                    jnp.asarray(self.high, float))
        return nvmap(trunc2std, args[0].ndim)(*args)

    def _log_prob_scalar(self, value, low, high, loc_fid, scale_fid):
        push = partial(std2trunc, loc=loc_fid, scale=scale_fid, low=low, high=high)
        ladj = jnp.log(jnp.abs(grad(push)(value)) + 1e-30)
        # push saturates AT the bounds: evaluate the uniform just inside so the
        # density (hence logpdf) stays finite when the tail clamps to the edge
        y = jnp.clip(push(value), low + 1e-30, high - 1e-30)
        return Uniform(low, high).log_prob(y) + ladj

    def log_prob(self, value):
        args = jnp.broadcast_arrays(value, *(jnp.asarray(x, float) for x in
                                             (self.low, self.high, self.loc_fid,
                                              self.scale_fid)))
        return nvmap(self._log_prob_scalar, args[0].ndim)(*args)


# ======================================================================= SHASH
_SHASH_DEG = 20
_shash_x, _shash_w = hermegauss(_SHASH_DEG)
_SHASH_X = jnp.asarray(_shash_x)
_SHASH_W = jnp.asarray(_shash_w / np.sqrt(2 * np.pi))  # E_{N(0,1)}[f] = sum w f(x)
_SHASH_ASINH_X = jnp.arcsinh(_SHASH_X)


class SinhArcsinh(Distribution):
    """Sinh-arcsinh of a normal, standardized so loc/scale ARE the mean/std.

    Raw transform (eps ~ N(0,1)): Z = sinh((asinh(eps) + skewness) * tailweight),
    then x = mean + std (Z - E[Z]) / sqrt(Var[Z]): shape is orthogonal to
    location/scale (removes the loc<->skew sampling ridge of the raw form).
    E[Z], Var[Z] by Gauss-Hermite quadrature.
    """

    def __init__(self, mean=0.0, std=1.0, skewness=0.0, tailweight=1.0):
        self.loc, self.scale = mean, std
        self.skewness, self.tailweight = skewness, tailweight

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(*(jnp.shape(x) for x in
                                      (self.loc, self.scale, self.skewness,
                                       self.tailweight)))

    def _standardizer(self):
        a = _SHASH_ASINH_X.reshape((-1,) + (1,) * len(self.batch_shape))
        Z = jnp.sinh((a + self.skewness) * self.tailweight)
        m = jnp.tensordot(_SHASH_W, Z, axes=(0, 0))
        v = jnp.tensordot(_SHASH_W, Z**2, axes=(0, 0)) - m**2
        return m, jnp.sqrt(v)

    def sample(self, key, sample_shape=()):
        m, s = self._standardizer()
        eps = jr.normal(key, sample_shape + self.batch_shape)
        Z = jnp.sinh((jnp.arcsinh(eps) + self.skewness) * self.tailweight)
        return self.loc + self.scale * (Z - m) / s

    def _to_normal(self, value):
        m, s = self._standardizer()
        Z = m + s * (value - self.loc) / self.scale
        eps = jnp.sinh(jnp.arcsinh(Z) / self.tailweight - self.skewness)
        return eps, Z, s

    def log_prob(self, value):
        eps, Z, s = self._to_normal(value)
        return (-0.5 * jnp.log(2 * jnp.pi) - 0.5 * eps**2 + 0.5 * jnp.log1p(eps**2)
                - jnp.log(self.tailweight) - 0.5 * jnp.log1p(Z**2)
                + jnp.log(s) - jnp.log(self.scale))

    def cdf(self, value):
        return norm.cdf(self._to_normal(value)[0])

    def log_cdf(self, value):
        return norm.logcdf(self._to_normal(value)[0])

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(jnp.square(self.scale), self.batch_shape)


# ======================================================================= quad gaussian
class QuadGaussian(Distribution):
    """Quadratic-in-Gaussian noise, mean-subtracted:
        obs = loc + scale1 eps + scale2 (eps^2 - 1),  eps ~ N(0,1),
    so E = loc, Var = scale1^2 + 2 scale2^2.  Exact density via the two
    Gaussian preimages of the quadratic; support is bounded on one side by
    loc - scale2 - scale1^2/(4 scale2)."""

    def __init__(self, loc=0.0, scale1=1.0, scale2=0.0):
        self.loc, self.scale1, self.scale2 = loc, scale1, scale2

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(*(jnp.shape(x) for x in
                                      (self.loc, self.scale1, self.scale2)))

    def sample(self, key, sample_shape=()):
        eps = jr.normal(key, sample_shape + self.batch_shape)
        return self.loc + self.scale1 * eps + self.scale2 * (eps**2 - 1.0)

    def _preimages(self, value):
        a, b = self.scale2, self.scale1
        r = value - self.loc + a          # a eps^2 + b eps = r
        D = b**2 + 4.0 * a * r
        D_safe = jnp.where(D > 0, D, 1.0)
        sq = jnp.sqrt(D_safe)
        a_safe = jnp.where(jnp.abs(a) < 1e-12, 1.0, a)
        return D, D_safe, (-b + sq) / (2 * a_safe), (-b - sq) / (2 * a_safe)

    def log_prob(self, value):
        a, b = self.scale2, self.scale1
        D, D_safe, ep, em = self._preimages(value)
        lp_quad = (-0.5 * jnp.log(2 * jnp.pi) - 0.5 * jnp.log(D_safe)
                   + logsumexp(jnp.stack([-0.5 * ep**2, -0.5 * em**2], 0), axis=0))
        lp_quad = jnp.where(D > 0, lp_quad, -jnp.inf)
        lp_gauss = -0.5 * jnp.log(2 * jnp.pi) - jnp.log(b) \
            - 0.5 * ((value - self.loc) / b) ** 2
        return jnp.where(jnp.abs(a) < 1e-8, lp_gauss, lp_quad)

    def log_cdf(self, value):
        a, b = self.scale2, self.scale1
        D, D_safe, ep, em = self._preimages(value)
        # a > 0: region is the eps-interval [em, ep] (empty if D < 0)
        lc_pos = jnp.where(D > 0, _log_diff_cdf(ep, em), -jnp.inf)
        # a < 0: region is (-inf, ep] U [em, inf) (all of R if D < 0)
        lc_neg = jnp.where(D > 0, jnp.logaddexp(norm.logcdf(ep), norm.logcdf(-em)), 0.0)
        lc_quad = jnp.where(a > 0, lc_pos, lc_neg)
        lc_gauss = norm.logcdf((value - self.loc) / b)
        return jnp.where(jnp.abs(a) < 1e-8, lc_gauss, lc_quad)

    def cdf(self, value):
        return jnp.exp(self.log_cdf(value))

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.scale1**2 + 2 * self.scale2**2, self.batch_shape)


class TwoQuadGaussian(Distribution):
    """Two-field quadratic-in-Gaussian noise:
        obs = loc + scale1 eps1 + scale2 (eps2^2 - 1),  eps1 _|_ eps2.
    Same first two moments as QuadGaussian but third moment 8 scale2^3 (the
    6 scale1^2 scale2 cross term exists only with shared noise).  Density by
    Gauss-Hermite marginalization over eps2 (smooth, differentiable)."""

    def __init__(self, loc=0.0, scale1=1.0, scale2=0.0, n_quad=64):
        self.loc, self.scale1, self.scale2 = loc, scale1, scale2
        z, w = hermegauss(n_quad)
        self._z = jnp.asarray(z)
        self._logw = jnp.asarray(np.log(w) - 0.5 * np.log(2 * np.pi))
        self.n_quad = n_quad

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(*(jnp.shape(x) for x in
                                      (self.loc, self.scale1, self.scale2)))

    def sample(self, key, sample_shape=()):
        k1, k2 = jr.split(key)
        shp = sample_shape + self.batch_shape
        return (self.loc + self.scale1 * jr.normal(k1, shp)
                + self.scale2 * (jr.normal(k2, shp) ** 2 - 1.0))

    def _quad_axes(self, value):
        nd = jnp.ndim(value)
        zr = self._z.reshape((-1,) + (1,) * nd)
        logwr = self._logw.reshape((-1,) + (1,) * nd)
        mu = self.loc + self.scale2 * (zr**2 - 1.0)
        return logwr, mu

    def log_prob(self, value):
        logwr, mu = self._quad_axes(value)
        comp = logwr + norm.logpdf(value[None], loc=mu, scale=self.scale1)
        return logsumexp(comp, axis=0)

    def log_cdf(self, value):
        logwr, mu = self._quad_axes(value)
        comp = logwr + norm.logcdf((value[None] - mu) / self.scale1)
        return logsumexp(comp, axis=0)

    def cdf(self, value):
        return jnp.exp(self.log_cdf(value))

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.scale1**2 + 2 * self.scale2**2, self.batch_shape)


# ======================================================================= skew normal
_B = np.sqrt(2.0 / np.pi)
# maximum |skewness| a skew-normal can realize (delta -> 1)
_GAMMA_MAX = ((4.0 - np.pi) / 2.0) * (2.0 / (np.pi - 2.0)) ** 1.5


class SkewNormal(Distribution):
    """Azzalini skew-normal in the centered parametrization (mean, std, skew):
    location/scale are decoupled from shape (no MCMC ridge), the moment map to
    (xi, omega, alpha) is closed form, and log_prob costs ~2 special-function
    evals per cell.  |skew| is clipped just inside the attainable bound
    ~0.9953.  cdf via Owen's T (small fixed Gauss-Legendre quadrature)."""

    def __init__(self, mean=0.0, std=1.0, skew=0.0,
                 max_skew=_GAMMA_MAX * (1.0 - 1e-6), n_owen=48):
        self.mean_, self.std, self.skew = mean, std, skew
        self.max_skew = float(min(max_skew, _GAMMA_MAX * (1.0 - 1e-6)))
        x, w = leggauss(n_owen)
        self._gl_t = jnp.asarray(0.5 * (x + 1.0))
        self._gl_w = jnp.asarray(0.5 * w)
        self._xi, self._omega, self._alpha, self._delta, self._gamma = \
            self._cp_to_dp(mean, std, skew)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(*(jnp.shape(x) for x in
                                      (self.mean_, self.std, self.skew)))

    def _cp_to_dp(self, mean, std, skew):
        g = jnp.clip(skew, -self.max_skew, self.max_skew)
        A = (2.0 * jnp.abs(g) / (4.0 - np.pi)) ** (2.0 / 3.0)
        muz = jnp.sign(g) * jnp.sqrt(A / (1.0 + A))   # standardized mean = b delta
        muz = jnp.clip(muz, -_B * (1 - 1e-7), _B * (1 - 1e-7))
        delta = muz / _B
        delta2 = jnp.clip(delta**2, 0.0, 1.0 - 1e-12)
        alpha = delta / jnp.sqrt(1.0 - delta2)
        omega = std / jnp.sqrt(1.0 - muz**2)
        xi = mean - omega * muz
        return xi, omega, alpha, delta, g

    def log_prob(self, value):
        z = (value - self._xi) / self._omega
        return (np.log(2.0) - jnp.log(self._omega)
                + norm.logpdf(z) + norm.logcdf(self._alpha * z))

    def sample(self, key, sample_shape=()):
        k0, k1 = jr.split(key)
        shp = sample_shape + self.batch_shape
        z0, z1 = jr.normal(k0, shp), jr.normal(k1, shp)
        d = self._delta
        return self._xi + self._omega * (d * jnp.abs(z0) + jnp.sqrt(1 - d**2) * z1)

    def _owens_t(self, h, a):
        aa = jnp.abs(a)
        upper = jnp.arctan(aa)
        th = upper[..., None] * self._gl_t
        sec2 = 1.0 / jnp.cos(th) ** 2
        integrand = jnp.exp(-0.5 * (h[..., None] ** 2) * sec2)
        integral = upper * jnp.sum(self._gl_w * integrand, axis=-1)
        return jnp.sign(a) * integral / (2.0 * np.pi)

    def cdf(self, value):
        z = (value - self._xi) / self._omega
        alpha = jnp.broadcast_to(self._alpha, jnp.shape(z))
        return jnp.clip(norm.cdf(z) - 2.0 * self._owens_t(z, alpha), 0.0, 1.0)

    def log_cdf(self, value):
        return jnp.log(jnp.clip(self.cdf(value), 1e-300, 1.0))

    @property
    def mean(self):
        return jnp.broadcast_to(self.mean_, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.std**2, self.batch_shape)

    @property
    def skewness(self):
        return jnp.broadcast_to(jnp.clip(self.skew, -self.max_skew, self.max_skew),
                                self.batch_shape)


def match_quadratic_gaussian(loc, scale1, scale2):
    """(mean, std, skew) of a SkewNormal matching the first three moments of
    QuadGaussian(loc, scale1, scale2)."""
    var = scale1**2 + 2.0 * scale2**2
    m3 = 2.0 * scale2 * (3.0 * scale1**2 + 4.0 * scale2**2)
    return loc, jnp.sqrt(var), m3 / var**1.5


# ======================================================================= cubic gaussian
class CubGaussian(Distribution):
    """Cubic-Hermite-in-Gaussian noise:
        obs = loc + s1 eps + s2 (eps^2 - 1) + s3 (eps^3 - 3 eps),
    with density from the real roots of the cubic (Cardano / trigonometric
    forms), summed over preimages.  Reduces to QuadGaussian as s3 -> 0."""

    def __init__(self, loc=0.0, scale1=1.0, scale2=0.0, scale3=0.0):
        self.loc, self.scale1, self.scale2, self.scale3 = loc, scale1, scale2, scale3

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(*(jnp.shape(x) for x in
                                      (self.loc, self.scale1, self.scale2, self.scale3)))

    def sample(self, key, sample_shape=()):
        eps = jr.normal(key, sample_shape + self.batch_shape)
        return (self.loc + self.scale1 * eps + self.scale2 * (eps**2 - 1)
                + self.scale3 * (eps**3 - 3 * eps))

    def log_prob(self, value):
        """Sum of N(0,1) densities over real roots eps of
        s3 e^3 + s2 e^2 + (s1 - 3 s3) e - (v - loc + s2) = 0, each weighted by
        1/|f'(eps)|.  Roots via the trigonometric method on the depressed
        cubic (differentiable away from the discriminant zero set)."""
        s1, s2, s3 = self.scale1, self.scale2, self.scale3
        tiny = jnp.abs(s3) < 1e-12
        s3_safe = jnp.where(tiny, 1.0, s3)

        # depressed cubic t^3 + p t + q with e = t - s2/(3 s3)
        a2 = s2 / s3_safe
        a1 = (s1 - 3 * s3) / s3_safe
        a0 = -(value - self.loc + s2) / s3_safe
        p = a1 - a2**2 / 3
        q = 2 * a2**3 / 27 - a2 * a1 / 3 + a0
        disc = -(4 * p**3 + 27 * q**2)

        def density_at(eps):
            fp = jnp.abs(s1 - 3 * s3 + 2 * s2 * eps + 3 * s3 * eps**2)
            return norm.pdf(eps) / jnp.maximum(fp, 1e-12)

        # three real roots (disc > 0): trigonometric form
        p_neg = jnp.minimum(p, -1e-12)
        m = 2 * jnp.sqrt(-p_neg / 3)
        arg = jnp.clip(3 * q / (p_neg * m), -1.0, 1.0)
        theta = jnp.arccos(arg) / 3
        dens3 = 0.0
        for k in range(3):
            t = m * jnp.cos(theta - 2 * np.pi * k / 3)
            dens3 = dens3 + density_at(t - a2 / 3)

        # one real root (disc < 0): Cardano with cube roots
        sq = jnp.sqrt(jnp.maximum(q**2 / 4 + p**3 / 27, 1e-300))
        u = jnp.cbrt(-q / 2 + sq)
        v = jnp.cbrt(-q / 2 - sq)
        dens1 = density_at(u + v - a2 / 3)

        dens = jnp.where(disc > 0, dens3, dens1)
        lp_cub = jnp.log(jnp.maximum(dens, 1e-300))
        lp_quad = QuadGaussian(self.loc, s1, s2).log_prob(value)
        return jnp.where(tiny, lp_quad, lp_cub)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(
            self.scale1**2 + 2 * self.scale2**2 + 6 * self.scale3**2
            + 6 * self.scale1 * self.scale3, self.batch_shape)
