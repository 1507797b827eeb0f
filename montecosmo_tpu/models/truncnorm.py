"""Truncated-normal transport: bijection between a standard normal variable
and a general truncated normal, stable to ~12 sigma in float32.

Used to keep bounded latents (Omega_m, sigma8, ngbars, ...) in unconstrained
~N(0,1) sample coordinates.  Body: CDF transport through the normal CDF/PPF;
tails (|x| > 12): a softmin/softmax (logsumexp at a tuned temperature) between
the identity and the bound, matching the transport's asymptote without
catastrophic cancellation.

Compile-time design: all branches are evaluated unconditionally on CLIPPED
inputs and combined with nested `where` (no `lax.switch`/`piecewise`) — the
three branches cost a few extra scalar flops but compile to one short fused
chain, and every branch stays finite where unselected so `where` gradients
are clean (double-where discipline).

Parity: reference `montecosmo/utils.py:192-264` (std2trunc/trunc2std).
"""
from jax import numpy as jnp
from jax.scipy.special import logsumexp
from jax.scipy.stats import norm

_TAIL_TEMP = 1 / 6.2842226 / 2  # softness tuned for the tail switch
# The reference switches at 12 sigma, viable only in float64: in f32 the
# second derivative of the CDF transport overflows ((1/phi)^2 > 3.4e38)
# beyond ~11 sigma, which poisons sampler gradients through the Jacobian
# term.  8 sigma keeps two AD levels finite in f32 with the same soft-tail
# asymptote (prior mass beyond 8 sigma ~ 1e-15).
_LIM = 8.0


def _softmax_pair(a, b):
    """Smooth maximum at the tail temperature."""
    return _TAIL_TEMP * jnp.logaddexp(a / _TAIL_TEMP, b / _TAIL_TEMP)


def _softmin_pair(a, b):
    return -_softmax_pair(-a, -b)


def _safe_ppf(p, dtype):
    """ppf with input clipped away from 1 (the saturating side; the 0 side is
    fine down to denormals) — keeps values AND gradients finite everywhere,
    including in the branch `where` does not select."""
    eps = jnp.finfo(dtype).eps
    return norm.ppf(jnp.clip(p, jnp.asarray(1e-37, dtype), 1 - eps))


def _body(x, low, high):
    """CDF transport, evaluated on the numerically favorable side of 0: the
    survival function is used for x >= 0 so neither branch saturates where it
    is selected (in f32 norm.cdf saturates to 1.0 beyond ~5.3 sigma)."""
    xc = jnp.clip(x, -_LIM, _LIM)
    dtype = jnp.result_type(x, jnp.float32)
    # x < 0 branch: lower CDF
    cdf_low, cdf_high = norm.cdf(low), norm.cdf(high)
    y_low = _safe_ppf(cdf_low + (cdf_high - cdf_low) * norm.cdf(xc), dtype)
    # x >= 0 branch: survival function (cdf(-x) = 1 - cdf(x) exactly)
    cdf_nlow, cdf_nhigh = norm.cdf(-low), norm.cdf(-high)
    y_high = -_safe_ppf(cdf_nhigh - (cdf_nhigh - cdf_nlow) * norm.cdf(-xc), dtype)
    return jnp.where(xc < 0, y_low, y_high)


def std2trunc(x, loc=0.0, scale=1.0, low=-jnp.inf, high=jnp.inf):
    """Transport a standard normal variable to a
    TruncNormal(loc, scale, low, high) variable."""
    x = jnp.asarray(x)
    scale = jnp.asarray(scale)
    low = (low - loc) / scale
    high = (high - loc) / scale

    body = _body(x, low, high)
    lowtail = _softmax_pair(x, jnp.broadcast_to(jnp.maximum(low, -1e30), jnp.shape(x)))
    hightail = _softmin_pair(x, jnp.broadcast_to(jnp.minimum(high, 1e30), jnp.shape(x)))

    out = jnp.where((x < -_LIM) & (low < -_LIM), lowtail,
                    jnp.where((_LIM < x) & (_LIM < high), hightail, body))
    return loc + scale * out


def _invbody(y, low, high):
    yc = jnp.clip(y, jnp.maximum(low, -_LIM), jnp.minimum(high, _LIM))
    dtype = jnp.result_type(y, jnp.float32)
    cdf_low, cdf_high = norm.cdf(low), norm.cdf(high)
    x_low = _safe_ppf((norm.cdf(yc) - cdf_low) / (cdf_high - cdf_low), dtype)
    cdf_nlow, cdf_nhigh = norm.cdf(-low), norm.cdf(-high)
    x_high = -_safe_ppf((cdf_nhigh - norm.cdf(-yc)) / (cdf_nhigh - cdf_nlow), dtype)
    return jnp.where(yc < 0, x_low, x_high)


def _inv_lowtail(y, low):
    """Inverse of the soft maximum y = t log(e^{x/t} + e^{low/t}):
    x = y + t log(-expm1((low - y)/t)), with y > low guaranteed."""
    u = jnp.minimum((low - y) / _TAIL_TEMP, -1e-12)
    return y + _TAIL_TEMP * jnp.log(-jnp.expm1(u))


def trunc2std(y, loc=0.0, scale=1.0, low=-jnp.inf, high=jnp.inf):
    """Transport a truncated normal variable back to a standard normal
    variable (inverse of `std2trunc`)."""
    y = jnp.asarray(y)
    y = (y - loc) / scale
    low = (low - loc) / scale
    high = (high - loc) / scale

    body = _invbody(y, low, high)
    lowf = jnp.maximum(low, -1e30)
    highf = jnp.minimum(high, 1e30)
    lowtail = _inv_lowtail(y, jnp.broadcast_to(lowf, jnp.shape(y)))
    hightail = -_inv_lowtail(-y, jnp.broadcast_to(-highf, jnp.shape(y)))

    out = jnp.where((y < -_LIM) & (low < -_LIM), lowtail,
                    jnp.where((_LIM < y) & (_LIM < high), hightail, body))
    return out
