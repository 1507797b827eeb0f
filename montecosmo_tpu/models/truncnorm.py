"""Truncated-normal transport: bijection between a standard normal variable
and a general truncated normal, stable to ~12 sigma in float32.

Used to keep bounded latents (Omega_m, sigma8, ngbars, ...) in unconstrained
~N(0,1) sample coordinates.  Body: CDF transport through the normal CDF/PPF;
tails (|x| > 12): a softmin/softmax (logsumexp at a tuned temperature) between
the identity and the bound, which matches the transport's asymptote without
catastrophic cancellation.

Parity: reference `montecosmo/utils.py:192-264` (std2trunc/trunc2std).
"""
from jax import numpy as jnp
from jax.scipy.special import logsumexp
from jax.scipy.stats import norm

_TAIL_TEMP = 1 / 6.2842226 / 2  # best softness at the 12-sigma switch
_LIM = 12.0


def _lowtail(x, low=-jnp.inf, high=None):
    energy = -jnp.stack(jnp.broadcast_arrays(x, low), axis=0)
    return _TAIL_TEMP * logsumexp(-energy / _TAIL_TEMP, axis=0)


def _hightail(x, low=None, high=jnp.inf):
    energy = jnp.stack(jnp.broadcast_arrays(x, high), axis=0)
    return -_TAIL_TEMP * logsumexp(-energy / _TAIL_TEMP, axis=0)


def _lowbody(x, low=-jnp.inf, high=jnp.inf):
    cdf_low, cdf_high = norm.cdf(low), norm.cdf(high)
    return norm.ppf(cdf_low + (cdf_high - cdf_low) * norm.cdf(x))


def _highbody(x, low=-jnp.inf, high=jnp.inf):
    # work with the survival function for x > 0: cdf(-x) = 1 - cdf(x) is exact
    cdf_nlow, cdf_nhigh = norm.cdf(-low), norm.cdf(-high)
    return -norm.ppf(cdf_nhigh - (cdf_nhigh - cdf_nlow) * norm.cdf(-x))


def _body(x, low=-jnp.inf, high=jnp.inf):
    return jnp.piecewise(x, [x < 0.0], [_lowbody, _highbody], low=low, high=high)


def std2trunc(x, loc=0.0, scale=1.0, low=-jnp.inf, high=jnp.inf):
    """Transport a standard normal variable to a truncated normal
    TruncNormal(loc, scale, low, high) variable."""
    scale = jnp.asarray(scale)
    low, high = (low - loc) / scale, (high - loc) / scale
    condlist = [(x < -_LIM) & (low < -_LIM), (_LIM < x) & (_LIM < high)]
    funclist = [_lowtail, _hightail, _body]
    return loc + scale * jnp.piecewise(x, condlist, funclist, low=low, high=high)


def _invlowbody(y, low=-jnp.inf, high=jnp.inf):
    cdf_low, cdf_high = norm.cdf(low), norm.cdf(high)
    return norm.ppf((norm.cdf(y) - cdf_low) / (cdf_high - cdf_low))


def _invhighbody(y, low=-jnp.inf, high=jnp.inf):
    cdf_nlow, cdf_nhigh = norm.cdf(-low), norm.cdf(-high)
    return -norm.ppf((cdf_nhigh - norm.cdf(-y)) / (cdf_nhigh - cdf_nlow))


def _invbody(y, low=-jnp.inf, high=jnp.inf):
    return jnp.piecewise(y, [y < 0.0], [_invlowbody, _invhighbody], low=low, high=high)


def _invhightail(y, low=None, high=jnp.inf):
    energy, b = jnp.split(jnp.stack(jnp.broadcast_arrays(y, high, 1, -1), axis=0), 2)
    return -_TAIL_TEMP * logsumexp(-energy / _TAIL_TEMP, axis=0, b=b)


def _invlowtail(y, low=-jnp.inf, high=None):
    energy, b = jnp.split(jnp.stack(jnp.broadcast_arrays(-y, -low, 1, -1), axis=0), 2)
    return _TAIL_TEMP * logsumexp(-energy / _TAIL_TEMP, axis=0, b=b)


def trunc2std(y, loc=0.0, scale=1.0, low=-jnp.inf, high=jnp.inf):
    """Transport a truncated normal variable back to a standard normal variable
    (inverse of `std2trunc`)."""
    y, low, high = (y - loc) / scale, (low - loc) / scale, (high - loc) / scale
    condlist = [(y < -_LIM) & (low < -_LIM), (_LIM < y) & (_LIM < high)]
    funclist = [_invlowtail, _invhightail, _invbody]
    return jnp.piecewise(y, condlist, funclist, low=low, high=high)
