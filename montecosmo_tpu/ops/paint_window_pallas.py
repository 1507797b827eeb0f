"""Pallas TPU kernel for lattice-window painting: VMEM-resident one-hots.

The XLA `ops.paint_window` path materializes the per-group one-hot matrix
(Pg, Wx*Wy) in HBM (~Wx*Wy*4 bytes of traffic PER PARTICLE), which makes it
HBM-bound (BENCH_NOTES.md).  This kernel keeps everything in VMEM: per
lattice group it builds the per-axis window weights, forms wx-chunked
one-hot slabs in registers/VMEM, and contracts them against the z-weights
with MXU matmuls — the only HBM traffic is positions in and the window
blocks out.

Layouts are MXU/VPU-friendly: the particle axis (Pg, a multiple of 128 for
the default tiling) is the lane dimension everywhere; the output block's
(Wy, Wz) trailing dims align with the (8, 128) vector tiling.

Kernel support: B-spline windows order 1-4 (`rectangular`); Kaiser-Bessel
falls back to the XLA path (Bessel i0 in Mosaic is not worth it).

Parity: same contract as `ops.paint_window.paint_window` (reference
montecosmo/nbody.py:365-467).
"""
from functools import partial

import numpy as np
import jax
from jax import lax, numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecosmo_tpu.ops.paint_window import (
    _clip_to_sites, _fold_axis, _pick_group, _regroup, _window_geometry,
)


def _bspline_T(s, order):
    """B-spline window of `order` at offsets s (any shape), branch-free."""
    a = jnp.abs(s)
    if order == 1:
        return (a <= 0.5).astype(s.dtype)  # round-based NGP (|s| < 0.5 a.e.)
    if order == 2:
        return jnp.maximum(1.0 - a, 0.0)
    if order == 3:
        w = jnp.where(a < 0.5, 0.75 - a * a, 0.0)
        w = jnp.where((a >= 0.5) & (a < 1.5), 0.5 * (1.5 - a) ** 2, w)
        return w
    if order == 4:
        w = jnp.where(a < 1.0, (4.0 - 6.0 * a * a + 3.0 * a ** 3) / 6.0, 0.0)
        w = jnp.where((a >= 1.0) & (a < 2.0), (2.0 - a) ** 3 / 6.0, w)
        return w
    raise ValueError(f"order {order} not supported in the Pallas paint")


def _paint_group_kernel(posT_ref, w_ref, out_ref, *, order, W, G, stride,
                        margin, Pg, wx_chunk, precision, dtype):
    """One lattice group: (3, Pg) positions + (1, Pg) weights ->
    (Wx, Wy, Wz) window block."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    base = (
        (i * (G[0] * stride[0]) - margin[0]).astype(dtype),
        (j * (G[1] * stride[1]) - margin[1]).astype(dtype),
        (k * (G[2] * stride[2]) - margin[2]).astype(dtype),
    )

    def axisT(d, width):
        # (width, Pg) window weights: s = offset - (pos - base)
        rel = posT_ref[0, 0, 0, d, :] - base[d]               # (Pg,)
        iota = lax.broadcasted_iota(dtype, (width, Pg), 0)
        return _bspline_T(iota - rel[None, :], order)

    axT = axisT(0, W[0])                                      # (Wx, Pg)
    ayT = axisT(1, W[1])                                      # (Wy, Pg)
    azT = axisT(2, W[2])                                      # (Wz, Pg)
    azw = (azT * w_ref[0, 0, 0, 0, :][None, :]).T             # (Pg, Wz)

    for c0 in range(0, W[0], wx_chunk):
        c1 = min(c0 + wx_chunk, W[0])
        # (chunk, Wy, Pg) -> (chunk*Wy, Pg) one-hot slab, VMEM-resident
        ohT = (axT[c0:c1][:, None, :] * ayT[None, :, :]).reshape(
            (c1 - c0) * W[1], Pg)
        blk = lax.dot_general(ohT, azw, (((1,), (0,)), ((), ())),
                              precision=precision,
                              preferred_element_type=dtype)
        out_ref[0, 0, 0, c0:c1, :, :] = blk.reshape(c1 - c0, W[1], W[2])


def paint_window_pallas(pos, shape: tuple, lattice_shape: tuple, weights=1.0,
                        order: int = 2, kernel_type="rectangular",
                        oversamp=1.0, max_disp=5, group=(8, 8, None),
                        wx_chunk=6, clip=True,
                        precision=lax.Precision.HIGHEST, interpret=False):
    # NOTE: Mosaic rejects Precision.HIGH ("Unsupported dot precision");
    # HIGHEST lowers to native f32 MXU passes inside the kernel.
    """Drop-in for `paint_window` on the Pallas kernel (rectangular kernels).

    Falls back to the XLA window path for kaiser_bessel.
    """
    if kernel_type != "rectangular":
        from montecosmo_tpu.ops.paint_window import paint_window
        return paint_window(pos, shape, lattice_shape, weights, order,
                            kernel_type, oversamp, max_disp, group,
                            clip=clip, precision=precision)

    (shape, lattice_shape, stride, H, G, margin, W,
     nG) = _window_geometry(shape, lattice_shape, order, max_disp, group)
    dtype = pos.dtype
    Pg = int(np.prod(G))

    pos = pos.reshape(lattice_shape + (3,))
    if clip:
        pos = _clip_to_sites(pos, lattice_shape, stride, H)
    weights = jnp.broadcast_to(
        jnp.asarray(weights, dtype),
        (int(np.prod(lattice_shape)),)).reshape(lattice_shape)

    # (nGx, nGy, nGz, 3, Pg) / (nGx, nGy, nGz, 1, Pg): lane dim = particles
    posg = _regroup(pos, lattice_shape, nG, G, (3,))
    posT = jnp.swapaxes(posg, -1, -2).reshape(nG + (3, Pg))
    wg = _regroup(weights, lattice_shape, nG, G, ()).reshape(nG + (1, Pg))

    kw = dict(order=order, W=W, G=G, stride=stride, margin=margin, Pg=Pg,
              nG=nG, wx_chunk=wx_chunk, precision=precision, dtype=dtype,
              interpret=interpret)

    @jax.custom_vjp
    def _core(posT, wg):
        return _pallas_paint_blocks(posT, wg, **kw)

    def _core_fwd(posT, wg):
        return _core(posT, wg), (posT, wg)

    def _core_bwd(res, ct):
        posT, wg = res
        return tuple(_pallas_paint_blocks_bwd(posT, wg, ct, **kw))

    _core.defvjp(_core_fwd, _core_bwd)
    blocks = _core(posT, wg)

    out = _fold_axis(blocks, shape[2], G[2] * stride[2], -margin[2],
                     block_axis=2, win_axis=5)
    out = _fold_axis(out, shape[1], G[1] * stride[1], -margin[1],
                     block_axis=1, win_axis=4)
    out = _fold_axis(out, shape[0], G[0] * stride[0], -margin[0],
                     block_axis=0, win_axis=3)
    return out


def _dbspline_T(s, order):
    """d/ds of `_bspline_T`, branch-free (sub-gradient 0 at kinks)."""
    a = jnp.abs(s)
    sg = jnp.sign(s)
    if order == 2:
        return -sg * (a < 1.0).astype(s.dtype)
    if order == 3:
        d = jnp.where(a < 0.5, -2.0 * a, 0.0)
        d = jnp.where((a >= 0.5) & (a < 1.5), -(1.5 - a), d)
        return d * sg
    if order == 4:
        d = jnp.where(a < 1.0, (-12.0 * a + 9.0 * a * a) / 6.0, 0.0)
        d = jnp.where((a >= 1.0) & (a < 2.0), -0.5 * (2.0 - a) ** 2, d)
        return d * sg
    raise ValueError(f"order {order} has no Pallas derivative window")


def _paint_group_bwd_kernel(posT_ref, w_ref, ct_ref, dpos_ref, dw_ref, *,
                            order, W, G, stride, margin, Pg, wx_chunk,
                            precision, dtype):
    """VJP of one group block: cotangent (Wx, Wy, Wz) -> d/dposT, d/dw.

        B [p,z] = sum_xy  ax ay ct[x,y,z]      dw = sum_z az B
        Bx[p,z] = sum_xy dax ay ct[x,y,z]      dpos_x = -w sum_z az Bx
        By[p,z] = sum_xy ax day ct[x,y,z]      dpos_y = -w sum_z az By
                                               dpos_z = -w sum_z daz B
    (the window argument is offset - pos, hence the minus signs)
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    base = (
        (i * (G[0] * stride[0]) - margin[0]).astype(dtype),
        (j * (G[1] * stride[1]) - margin[1]).astype(dtype),
        (k * (G[2] * stride[2]) - margin[2]).astype(dtype),
    )

    def axisT(d, width, deriv=False):
        rel = posT_ref[0, 0, 0, d, :] - base[d]
        iota = lax.broadcasted_iota(dtype, (width, Pg), 0)
        f = _dbspline_T if deriv else _bspline_T
        return f(iota - rel[None, :], order)

    axT = axisT(0, W[0])
    ayT = axisT(1, W[1])
    azT = axisT(2, W[2])
    daxT = axisT(0, W[0], deriv=True)
    dayT = axisT(1, W[1], deriv=True)
    dazT = axisT(2, W[2], deriv=True)

    B = jnp.zeros((Pg, W[2]), dtype)
    Bx = jnp.zeros((Pg, W[2]), dtype)
    By = jnp.zeros((Pg, W[2]), dtype)
    for c0 in range(0, W[0], wx_chunk):
        c1 = min(c0 + wx_chunk, W[0])
        ctc = ct_ref[0, 0, 0, c0:c1, :, :].reshape((c1 - c0) * W[1], W[2])

        def acc(wxT, wyT):
            ohT = (wxT[c0:c1][:, None, :] * wyT[None, :, :]).reshape(
                (c1 - c0) * W[1], Pg)
            return lax.dot_general(ohT, ctc, (((0,), (0,)), ((), ())),
                                   precision=precision,
                                   preferred_element_type=dtype)

        B = B + acc(axT, ayT)
        Bx = Bx + acc(daxT, ayT)
        By = By + acc(axT, dayT)

    w = w_ref[0, 0, 0, 0, :]                                   # (Pg,)
    dw_ref[0, 0, 0, 0, :] = jnp.sum(azT.T * B, axis=1)
    dpos_ref[0, 0, 0, 0, :] = -w * jnp.sum(azT.T * Bx, axis=1)
    dpos_ref[0, 0, 0, 1, :] = -w * jnp.sum(azT.T * By, axis=1)
    dpos_ref[0, 0, 0, 2, :] = -w * jnp.sum(dazT.T * B, axis=1)


def _pallas_paint_blocks(posT, wg, *, order, W, G, stride, margin, Pg, nG,
                         wx_chunk, precision, dtype, interpret):
    kern = partial(_paint_group_kernel, order=order, W=W, G=G, stride=stride,
                   margin=margin, Pg=Pg, wx_chunk=wx_chunk,
                   precision=precision, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=nG,
        in_specs=[
            pl.BlockSpec((1, 1, 1, 3, Pg), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1, Pg), lambda i, j, k: (i, j, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1) + W,
                               lambda i, j, k: (i, j, k, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(nG + W, dtype),
        interpret=interpret,
    )(posT, wg)


def _pallas_paint_blocks_bwd(posT, wg, ct, *, order, W, G, stride, margin,
                             Pg, nG, wx_chunk, precision, dtype, interpret):
    kern = partial(_paint_group_bwd_kernel, order=order, W=W, G=G,
                   stride=stride, margin=margin, Pg=Pg, wx_chunk=wx_chunk,
                   precision=precision, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=nG,
        in_specs=[
            pl.BlockSpec((1, 1, 1, 3, Pg), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1, Pg), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((1, 1, 1) + W, lambda i, j, k: (i, j, k, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, 3, Pg), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1, Pg), lambda i, j, k: (i, j, k, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(nG + (3, Pg), dtype),
            jax.ShapeDtypeStruct(nG + (1, Pg), dtype),
        ],
        interpret=interpret,
    )(posT, wg, ct)
