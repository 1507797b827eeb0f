"""Halo-exchanged mass assignment for spatially sharded particle sets.

Each device owns an X-slab of the mesh and the particles whose base cell
falls inside it.  Painting accumulates into a locally extended buffer
(slab + halo faces on both sides); the faces then ride ICI to the neighbor
slabs via two `ppermute`s and are added in.  Reading mirrors this: fetch the
neighbors' edge planes first, gather locally.

The halo width must cover the paint stencil reach: order//2 + 1 cells is
enough for B-spline orders <= 4 plus the interlacing half-cell shift.

Functions run INSIDE `shard_map` over a 1D device-mesh axis.
"""
from functools import partial
from itertools import product

import numpy as np
import jax
from jax import lax, numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from montecosmo_tpu.ops.paint import _flat_wrapped, _stencil, _window_fn


def _halo_exchange_add(buf, halo, axis_name):
    """Fold the +/- halo faces of an extended X-buffer into the neighbors."""
    p = lax.axis_size(axis_name)
    up = [(i, (i + 1) % p) for i in range(p)]
    down = [(i, (i - 1) % p) for i in range(p)]

    hi_face = buf[-halo:]           # belongs to the next slab
    lo_face = buf[:halo]            # belongs to the previous slab
    from_prev = lax.ppermute(hi_face, axis_name, up)
    from_next = lax.ppermute(lo_face, axis_name, down)

    core = buf[halo:-halo]
    core = core.at[:halo].add(from_prev)
    core = core.at[-halo:].add(from_next)
    return core


def _halo_extend(core, halo, axis_name):
    """Prepend/append the neighbors' edge planes to a local X-slab."""
    p = lax.axis_size(axis_name)
    up = [(i, (i + 1) % p) for i in range(p)]
    down = [(i, (i - 1) % p) for i in range(p)]

    lo_from_prev = lax.ppermute(core[-halo:], axis_name, up)
    hi_from_next = lax.ppermute(core[:halo], axis_name, down)
    return jnp.concatenate([lo_from_prev, core, hi_from_next], axis=0)


def halo_paint_local(pos, shape, weights=1.0, order=2, axis_name="mesh",
                     kernel_type="rectangular", oversamp=1.0, halo=None):
    """Paint locally owned particles into this device's X-slab of the GLOBAL
    `shape` mesh (call inside shard_map).

    pos : (n_local, 3) GLOBAL cell coordinates of the owned particles (their
    base cell must lie in this slab; the stencil may spill into the halo).
    Returns the local slab (X/P, Y, Z) after halo folding.
    """
    if halo is None:
        halo = order // 2 + 1
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    nx_local = shape[0] // p
    assert halo <= nx_local, (
        f"halo ({halo}) must not exceed the local slab width ({nx_local}): "
        "faces would wrap past the nearest neighbor")
    local_shape = (nx_local + 2 * halo, shape[1], shape[2])

    kernel = _window_fn(order, kernel_type, oversamp)
    round_fn = jnp.round if order % 2 else jnp.floor
    # shift into extended-local coordinates (x only)
    offset = jnp.asarray([1.0, 0.0, 0.0], pos.dtype) * (
        (idx * nx_local - halo).astype(pos.dtype))
    lpos = pos - offset
    id0 = round_fn(lpos).astype(jnp.int32)
    shifts = _stencil(local_shape, order)
    weights = jnp.broadcast_to(jnp.asarray(weights, pos.dtype), pos.shape[:-1])

    n = int(np.prod(local_shape))

    def step(carry, shift):
        cell = id0 + shift
        ker = kernel(cell - lpos).prod(-1)
        # wrap only Y/Z; X stays in the extended buffer (halo covers spill)
        cx = jnp.clip(cell[..., 0], 0, local_shape[0] - 1)
        cy = cell[..., 1] % shape[1]
        cz = cell[..., 2] % shape[2]
        flat = (cx * shape[1] + cy) * shape[2] + cz
        carry = carry.at[flat.reshape(-1)].add((weights * ker).reshape(-1))
        return carry, None

    init = lax.pcast(jnp.zeros(n, pos.dtype), (axis_name,), to="varying")
    buf = lax.scan(step, init, shifts)[0].reshape(local_shape)
    return _halo_exchange_add(buf, halo, axis_name)


def halo_read_local(pos, local_mesh, order=2, axis_name="mesh",
                    kernel_type="rectangular", oversamp=1.0, halo=None):
    """Read an X-sharded mesh at locally owned GLOBAL positions (inside
    shard_map).  local_mesh : this device's (X/P, Y, Z) slab."""
    if halo is None:
        halo = order // 2 + 1
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    nx_local = local_mesh.shape[0]
    shape = (nx_local * p, local_mesh.shape[1], local_mesh.shape[2])

    ext = _halo_extend(local_mesh, halo, axis_name)
    ext_shape = ext.shape

    kernel = _window_fn(order, kernel_type, oversamp)
    round_fn = jnp.round if order % 2 else jnp.floor
    offset = jnp.asarray([1.0, 0.0, 0.0], pos.dtype) * (
        (idx * nx_local - halo).astype(pos.dtype))
    lpos = pos - offset
    id0 = round_fn(lpos).astype(jnp.int32)
    shifts = _stencil(ext_shape, order)
    flat_mesh = ext.reshape(-1)

    def step(carry, shift):
        cell = id0 + shift
        ker = kernel(cell - lpos).prod(-1)
        cx = jnp.clip(cell[..., 0], 0, ext_shape[0] - 1)
        cy = cell[..., 1] % shape[1]
        cz = cell[..., 2] % shape[2]
        flat = (cx * shape[1] + cy) * shape[2] + cz
        return carry + flat_mesh[flat] * ker, None

    init = lax.pcast(jnp.zeros(pos.shape[:-1], local_mesh.dtype), (axis_name,),
                     to="varying")
    out = lax.scan(step, init, shifts)[0]
    return out


def halo_paint(pos_sharded, shape, mesh: Mesh, weights=1.0, order=2,
               axis_name="mesh", **kw):
    """Whole-array wrapper: paint particles (sharded on their leading axis by
    slab ownership) into an X-sharded mesh of global `shape`."""
    def body(pos, wgt):
        return halo_paint_local(pos, shape, weights=wgt, order=order,
                                axis_name=axis_name, **kw)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P() if np.ndim(weights) == 0 else P(axis_name)),
        out_specs=P(axis_name, None, None))
    return fn(pos_sharded, jnp.asarray(weights, jnp.asarray(pos_sharded).dtype))


def halo_read(pos_sharded, mesh_sharded, mesh: Mesh, order=2,
              axis_name="mesh", **kw):
    """Whole-array wrapper: read an X-sharded mesh at slab-owned particles."""
    fn = jax.shard_map(
        partial(halo_read_local, order=order, axis_name=axis_name, **kw),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name, None, None)),
        out_specs=P(axis_name))
    return fn(pos_sharded, mesh_sharded)


def _fold_axis_ext(blocks, out_len, stride, base0, block_axis, win_axis):
    """Overlap-add of per-group windows along a NON-periodic axis.

    Like `paint_window._fold_axis` but into a length-`out_len` buffer with no
    wrap: group g's window starts at g*stride + base0 with base0 >= 0 and all
    windows contained in [0, out_len) (the caller guarantees the margin fits
    inside the halo).  Returns the array with the (group, window) axes
    replaced by one length-`out_len` axis at `block_axis`.
    """
    W = blocks.shape[win_axis]
    n_seg = -(-W // stride)
    pad = n_seg * stride - W
    if pad:
        pad_width = [(0, 0)] * blocks.ndim
        pad_width[win_axis] = (0, pad)
        blocks = jnp.pad(blocks, pad_width)

    blocks = jnp.moveaxis(blocks, (block_axis, win_axis), (0, 1))
    n = blocks.shape[0]
    rest = blocks.shape[2:]
    blocks = blocks.reshape((n, n_seg, stride) + rest)

    # every group's WINDOW content fits ([0, out_len)); only the zero pad of
    # the last segment may spill past the end, so trimming the tail is safe
    assert base0 >= 0 and (n - 1) * stride + base0 + W <= out_len, (
        f"window fold out of range (halo too small for the paint margin): "
        f"base0={base0} W={W} out_len={out_len}")
    out = jnp.zeros((out_len,) + rest, blocks.dtype)
    for c in range(n_seg):
        off = base0 + c * stride
        flat = blocks[:, c].reshape((n * stride,) + rest)
        trim = max(0, off + n * stride - out_len)
        if trim:
            flat = flat[:n * stride - trim]
        out = out + jnp.pad(
            flat, [(off, out_len - off - flat.shape[0])] + [(0, 0)] * len(rest))
    return jnp.moveaxis(out, 0, block_axis)


def halo_paint_window_local(pos, shape, lattice_shape, weights=1.0, order=2,
                            axis_name="mesh", kernel_type="rectangular",
                            oversamp=1.0, halo=None, max_disp=8,
                            group=(None, None, None), batch_size=8, clip=True,
                            precision=None):
    """Scatter-free halo painting: the slab's lattice-ordered particles are
    painted into the extended local buffer with per-group MXU matmuls
    (`ops.paint_window` formulation), then the halo faces ride ICI exactly
    like `halo_paint_local`.

    pos           : (n_local, 3) GLOBAL cell coords of the owned particles,
                    locally lattice-ordered (reshapeable to the local lattice
                    + (3,)), each within max_disp cells of its site.
    lattice_shape : GLOBAL particle-lattice shape; its x extent is sharded
                    over the mesh axis like `shape[0]`.
    halo          : must cover the window margin: max_disp + order//2 + 2.
    Returns the local core slab (X/P, Y, Z) after halo folding, equal to
    `halo_paint_local` up to f32 summation order.
    """
    from montecosmo_tpu.ops.paint_window import (
        _axis_window_weights, _clip_to_sites, _fold_axis, _pick_group,
        _regroup,
    )
    from jax import checkpoint as jax_checkpoint

    if precision is None:
        precision = lax.Precision.HIGHEST
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    shape = tuple(int(s) for s in shape)
    lattice_shape = tuple(int(s) for s in lattice_shape)
    nx_local = shape[0] // p
    latx_local = lattice_shape[0] // p
    lat_local = (latx_local,) + lattice_shape[1:]
    stride = tuple(m // l for m, l in zip((nx_local,) + shape[1:], lat_local))
    H = tuple(int(h) for h in np.broadcast_to(max_disp, (3,)))
    margin = tuple(h + order // 2 + 2 for h in H)
    if halo is None:
        halo = margin[0]
    assert halo >= margin[0], (
        f"halo ({halo}) must cover the window margin ({margin[0]})")
    nx_ext = nx_local + 2 * halo
    dtype = pos.dtype

    default_g = (min(8, latx_local), 8, _pick_group(lat_local[2], 64))
    G = tuple(_pick_group(l, d if g is None else g)
              for l, g, d in zip(lat_local, group, default_g))
    W = tuple(g * s + 2 * m for g, s, m in zip(G, stride, margin))
    nG = tuple(l // g for l, g in zip(lat_local, G))
    Pg = int(np.prod(G))

    # extended-local coordinates: x sites at i*stride_x + halo (static)
    offset = jnp.asarray([1.0, 0.0, 0.0], dtype) * (
        (idx * nx_local - halo).astype(dtype))
    lpos = (pos - offset).reshape(lat_local + (3,))
    if clip:
        site0 = jnp.asarray([halo, 0, 0], dtype)
        lpos = _clip_to_sites(lpos - site0, lat_local, stride, H) + site0
    weights = jnp.broadcast_to(jnp.asarray(weights, dtype),
                               (int(np.prod(lat_local)),)).reshape(lat_local)
    posg = _regroup(lpos, lat_local, nG, G, (3,))
    wg = _regroup(weights, lat_local, nG, G, ())

    gidx = jnp.stack(jnp.meshgrid(*(jnp.arange(n) for n in nG),
                                  indexing="ij"), -1).reshape(-1, 3)
    # x windows start at gx*Gx*sx + halo - margin (>= 0, no wrap); y/z bases
    # are periodic exactly as in paint_window
    bases = gidx * jnp.asarray([g * s for g, s in zip(G, stride)]) \
        + jnp.asarray([halo - margin[0], -margin[1], -margin[2]])

    def body(args):
        pg, w, b = args
        ax = _axis_window_weights(pg[:, 0] - b[0].astype(dtype), W[0], order,
                                  kernel_type, oversamp)
        ay = _axis_window_weights(pg[:, 1] - b[1].astype(dtype), W[1], order,
                                  kernel_type, oversamp)
        az = _axis_window_weights(pg[:, 2] - b[2].astype(dtype), W[2], order,
                                  kernel_type, oversamp)
        oh_xy = (ax[:, :, None] * ay[:, None, :]).reshape(Pg, W[0] * W[1])
        return jnp.einsum("pr,pz->rz", oh_xy, az * w[:, None],
                          preferred_element_type=dtype, precision=precision)

    blocks = lax.map(jax_checkpoint(body), (posg, wg, bases),
                     batch_size=batch_size)
    blocks = blocks.reshape(nG + (W[0], W[1], W[2]))

    out = _fold_axis(blocks, shape[2], G[2] * stride[2], -margin[2],
                     block_axis=2, win_axis=5)
    out = _fold_axis(out, shape[1], G[1] * stride[1], -margin[1],
                     block_axis=1, win_axis=4)
    out = _fold_axis_ext(out, nx_ext, G[0] * stride[0], halo - margin[0],
                         block_axis=0, win_axis=3)
    return _halo_exchange_add(out, halo, axis_name)


def halo_paint_window(pos_sharded, shape, lattice_shape, mesh: Mesh,
                      weights=1.0, order=2, axis_name="mesh", **kw):
    """Whole-array wrapper for `halo_paint_window_local` (lattice-ordered
    particles sharded by slab on their leading axis)."""
    def body(pos, wgt):
        return halo_paint_window_local(pos, shape, lattice_shape, weights=wgt,
                                       order=order, axis_name=axis_name, **kw)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P() if np.ndim(weights) == 0 else P(axis_name)),
        out_specs=P(axis_name, None, None))
    return fn(pos_sharded, jnp.asarray(weights, jnp.asarray(pos_sharded).dtype))
