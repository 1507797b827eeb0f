"""Bayesian decision utilities: weighted quantiles and credible sets.

Parity: reference `montecosmo/bdec.py` — weighted 1st/2nd-order quantiles
(:105-163), credible-interval dispatch (:194-210), equal-tail/low/high
intervals (:215-237), multivariate quantile-based sets (:240-266), and the
smallest (highest-density) interval including a weighted jittable version
(:269-342).
"""
from functools import partial

import numpy as np
from jax import numpy as jnp, vmap

from montecosmo_tpu.utils.safe import safe_div


def _vsearchsorted(a, v, side="left"):
    """searchsorted of each row of `v` into each row of `a` -> (len(v), rows)."""
    return vmap(vmap(partial(jnp.searchsorted, side=side), in_axes=(0, None)),
                in_axes=(None, 0))(a, v)


def cumulative_trapezoid(y, x=None, dx=1.0, axis=-1, initial=None):
    """Cumulative composite-trapezoid integral of y(x) along `axis`."""
    y = jnp.asarray(y)
    if x is None:
        d = dx
    else:
        x = jnp.asarray(x)
        if x.ndim == 1:
            shape = [1] * y.ndim
            shape[axis] = -1
            d = jnp.diff(x).reshape(shape)
        elif x.ndim != y.ndim:
            raise ValueError("x must be 1-D or match y's shape")
        else:
            d = jnp.diff(x, axis=axis)

    d = jnp.moveaxis(d, axis, 0) if jnp.ndim(d) else d
    yy = jnp.moveaxis(y, axis, 0)
    res = jnp.cumsum(d * (yy[1:] + yy[:-1]) / 2.0, axis=0)
    res = jnp.moveaxis(res, 0, axis)

    if initial is not None:
        shape = list(res.shape)
        shape[axis] = 1
        res = jnp.concatenate(
            [jnp.full(shape, initial, dtype=res.dtype), res], axis=axis)
    return res


def _broadcast_weights(w, shape, axis=None):
    if w is None:
        return jnp.ones(shape)
    if jnp.ndim(w) <= 1 and axis is not None:
        w = jnp.expand_dims(w, tuple(range(jnp.ndim(w), len(shape) - axis)))
    return jnp.broadcast_to(w, shape)


def quantile(x, p, axis=0, weights=None, ord=1):
    """Weighted quantile by CDF interpolation.

    ord=1 : linear CDF interpolation of the cumulative weight sum;
    ord=2 : quadratic CDF interpolation from the trapezoid density integral
            (better for density-weighted samples that cover the support).
    """
    p = jnp.asarray(p)
    p_shape = p.shape
    p = p.reshape(-1)

    x = jnp.atleast_1d(x)
    w = _broadcast_weights(weights, x.shape, axis)
    x, w = jnp.moveaxis(x, axis, 0), jnp.moveaxis(w, axis, 0)
    n, *out_shape = x.shape
    x, w = x.reshape(n, -1), w.reshape(n, -1)

    order = jnp.argsort(x, 0)
    xs = jnp.take_along_axis(x, order, 0)
    ws = jnp.take_along_axis(w, order, 0)

    if ord == 1:
        cdf = jnp.cumsum(ws, 0)
        cdf = safe_div(cdf, cdf[-1])
        hi = jnp.clip(_vsearchsorted(cdf.T, p), 1, n - 1)
        cdf_lo = jnp.take_along_axis(cdf, hi - 1, 0)
        cdf_hi = jnp.take_along_axis(cdf, hi, 0)
        q_lo = jnp.take_along_axis(xs, hi - 1, 0)
        q_hi = jnp.take_along_axis(xs, hi, 0)
        q = q_lo + (p[:, None] - cdf_lo) * safe_div(q_hi - q_lo, cdf_hi - cdf_lo)
    elif ord == 2:
        cdf = cumulative_trapezoid(ws, xs, axis=0, initial=0)
        ws = safe_div(ws, cdf[-1])
        cdf = safe_div(cdf, cdf[-1])
        hi = jnp.clip(_vsearchsorted(cdf.T, p), 1, n - 1)
        cdf_lo = jnp.take_along_axis(cdf, hi - 1, 0)
        q_lo = jnp.take_along_axis(xs, hi - 1, 0)
        q_hi = jnp.take_along_axis(xs, hi, 0)
        w_lo = jnp.take_along_axis(ws, hi - 1, 0)
        w_hi = jnp.take_along_axis(ws, hi, 0)
        # solve a/2 (q-q_lo)^2 + w_lo (q-q_lo) = p - cdf_lo
        a = safe_div(w_hi - w_lo, q_hi - q_lo)
        dp = p[:, None] - cdf_lo
        disc = jnp.maximum(w_lo**2 + 2 * a * dp, 0)
        q = q_lo + jnp.where(a == 0, safe_div(dp, w_lo),
                             safe_div(-w_lo + disc**0.5, a))
    else:
        raise NotImplementedError("only ord 1 and 2")
    q = jnp.clip(q, q_lo, q_hi)  # no extrapolation
    return q.reshape(*p_shape, *out_shape)


def argmedian(a, axis=-1):
    """Indices of median values along `axis` (the upper index when even)."""
    k = a.shape[axis] // 2
    return np.argpartition(a, k, axis).take(k, axis)


# ----------------------------------------------------------------------- intervals
def credint(x, p=0.95, axis=0, weights=None, type="small", ord=1):
    """p-credible interval: 'small' (smallest / HDI), 'low', 'med'
    (equal-tail), or 'high'."""
    if type == "small":
        if weights is None:
            return sci_noweights(x, p, axis)
        return sci(x, p, axis, weights, ord)
    return qbci(x, p, axis, weights, type, ord)


def qbci(x, p=0.95, axis=0, weights=None, type="med", ord=1):
    """Quantile-based credible interval: lowest / equal-tail / highest."""
    p = jnp.asarray(p)
    if type == "low":
        p_low = jnp.zeros_like(p)
    elif type == "med":
        p_low = (1 - p) / 2
    elif type == "high":
        p_low = 1 - p
    else:
        raise ValueError(type)
    q_lo = quantile(x, p_low, axis, weights, ord)
    q_hi = quantile(x, p_low + p, axis, weights, ord)
    return jnp.stack([q_lo, q_hi], -1)


def qbcs(x, p=0.95, weights=None, type="med", norm=jnp.inf):
    """Quantile-based credible SET: norm-ball of probability p around the
    per-dimension low/median/high centers.

    x : (*batch, n_samples, n_dim).  Returns (center, radius).
    """
    x = jnp.atleast_2d(x)
    type = np.broadcast_to(type, x.shape[-1])
    quants = quantile(x, jnp.asarray([0.0, 0.5, 1.0]), -2, weights)
    center = jnp.select([type == "low", type == "med", type == "high"], quants)
    dists = jnp.linalg.norm(x - center[..., None, :], ord=norm, axis=-1)
    radius = quantile(dists, p, -1, weights)
    return center, radius


def sci_noweights(x, p: float = 0.95, axis=0):
    """Smallest credible interval (HDI) for unweighted samples.

    Not vmappable over p nor jittable (integer interval length).
    """
    x = jnp.moveaxis(x, axis, 0)
    xs = jnp.sort(x, axis=0)
    n = x.shape[0]
    length = min(int(np.rint(p * n)), n - 1)

    lows = xs[: n - length]
    highs = xs[length:]
    i_lo = (highs - lows).argmin(axis=0)
    q_lo = jnp.take_along_axis(xs, i_lo[None], 0)[0]
    q_hi = jnp.take_along_axis(xs, (i_lo + length)[None], 0)[0]
    return jnp.stack([q_lo, q_hi], axis=-1)


def sci(x, p=0.95, axis=0, weights=None, ord=1):
    """Smallest credible interval (HDI) for weighted samples — jittable and
    vectorized over p: scan all admissible low edges, pick the shortest."""
    p = jnp.asarray(p)
    p_shape = p.shape
    p = p.reshape(-1)

    x = jnp.atleast_1d(x)
    w = _broadcast_weights(weights, x.shape, axis)
    x, w = jnp.moveaxis(x, axis, 0), jnp.moveaxis(w, axis, 0)
    n, *out_shape = x.shape
    x, w = x.reshape(n, -1), w.reshape(n, -1)

    order = jnp.argsort(x, 0)
    xs = jnp.take_along_axis(x, order, 0)
    ws = jnp.take_along_axis(w, order, 0)

    if ord == 1:
        cdf = jnp.cumsum(ws, 0)
    elif ord == 2:
        cdf = cumulative_trapezoid(ws, xs, axis=0, initial=0)
        ws = safe_div(ws, cdf[-1])
    else:
        raise NotImplementedError("only ord 1 and 2")
    cdf = safe_div(cdf, cdf[-1])

    # candidate low edges: every sample with cdf <= 1-p
    q_lows = jnp.where(cdf <= (1 - p)[:, None, None], xs, xs[0])

    if x.shape[1] > 1:
        q_highs = vmap(lambda xc, pc, wc: quantile(xc, pc, 0, wc, ord),
                       in_axes=(-1, -1, -1), out_axes=-1)(
            xs, cdf + p[:, None, None], ws)
    else:
        q_highs = quantile(xs[:, 0], cdf[:, 0] + p[:, None], 0, ws[:, 0], ord)
        q_lows = q_lows[:, :, 0]

    lengths = q_highs - q_lows
    i_small = lengths.argmin(axis=1)
    q_lo = jnp.take_along_axis(q_lows, i_small[:, None], 1)
    q_hi = jnp.take_along_axis(q_highs, i_small[:, None], 1)
    return jnp.stack([q_lo, q_hi], axis=-1).reshape(*p_shape, *out_shape, 2)
