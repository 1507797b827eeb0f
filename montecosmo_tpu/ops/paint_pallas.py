"""Experimental Pallas CIC paint kernel (TPU).

Strategy: hold the whole mesh as a VMEM-resident (X*Y, Z) accumulator (fits
for meshes up to ~128^3 in f32 on a 16 MB-VMEM core) and stream particles
with a `fori_loop`; each particle turns its two z-stencil weights into one
(1, Z) lane-vector via iota comparison and performs 4 dynamic row
read-modify-writes (the (x, y) stencil).  This trades the XLA scatter's
random HBM round trips for VMEM row updates.

Measured status on TPU v5e (see BENCH_NOTES.md): at 112^3 / 1.4M particles
the XLA flat scatter-add (`ops.paint`) runs in ~82 ms and this kernel in
~230 ms — the per-particle `fori_loop` is scalar-unit bound (~4 VMEM row
RMWs + index math per particle at ~1 GHz), while XLA's scatter pipelines
random HBM updates at ~8 ns/element.  The XLA path therefore remains the
production default.  The profitable evolution of this kernel is batch
vectorization: bucket particles by (x, y) row via an on-chip counting sort so
whole (8, Z) sublane groups accumulate with one vector op per row run; kept
here as the validated starting point (exact CIC match in interpret and
compiled modes).
"""
from functools import partial

import numpy as np
import jax
from jax import numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _paint_kernel(pos_ref, w_ref, out_ref, *, X, Y, Z, P):
    out_ref[:] = jnp.zeros_like(out_ref)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (1, Z), 1)

    def body(i, _):
        x = pos_ref[i, 0]
        y = pos_ref[i, 1]
        z = pos_ref[i, 2]
        w = w_ref[i, 0]
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        z0 = jnp.floor(z).astype(jnp.int32)
        fx = x - x0.astype(x.dtype)
        fy = y - y0.astype(y.dtype)
        fz = z - z0.astype(z.dtype)

        # (1, Z) z-row: CIC pair at z0, z0+1 (periodic)
        z0m = z0 % Z
        z1m = (z0 + 1) % Z
        zrow = (jnp.where(iota_z == z0m, 1.0 - fz, 0.0)
                + jnp.where(iota_z == z1m, fz, 0.0)) * w

        for dx in (0, 1):
            wx = (1.0 - fx) if dx == 0 else fx
            xi = (x0 + dx) % X
            for dy in (0, 1):
                wy = (1.0 - fy) if dy == 0 else fy
                yi = (y0 + dy) % Y
                r = xi * Y + yi
                out_ref[pl.ds(r, 1), :] += (wx * wy) * zrow
        return 0

    jax.lax.fori_loop(0, P, body, 0)


def paint_pallas_cic(pos, shape, weights=1.0, interpret=False):
    """CIC paint via the VMEM-resident Pallas kernel (particles in VMEM).

    pos : (P, 3) positions in cell units; shape : 3D mesh shape with
    X*Y*Z*4 bytes <~ 8 MB and P*16 bytes fitting VMEM alongside it.
    Returns the painted real mesh.
    """
    X, Y, Z = (int(s) for s in shape)
    P = int(pos.shape[0])
    # (P, 1): Mosaic cannot index 1-D VMEM refs with a dynamic scalar
    weights = jnp.broadcast_to(jnp.asarray(weights, pos.dtype), (P,)).reshape(P, 1)

    out = pl.pallas_call(
        partial(_paint_kernel, X=X, Y=Y, Z=Z, P=P),
        out_shape=jax.ShapeDtypeStruct((X * Y, Z), pos.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pos, weights)
    return out.reshape(X, Y, Z)


def _paint_grid_kernel(pos_ref, w_ref, out_ref, *, X, Y, Z, CHUNK):
    """Grid-pipelined variant: each grid step receives a (CHUNK, 3) particle
    block (Pallas double-buffers the HBM->VMEM streaming) and accumulates into
    the same VMEM mesh block across steps."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    iota_z = jax.lax.broadcasted_iota(jnp.int32, (1, Z), 1)

    def body(i, _):
        x = pos_ref[i, 0]
        y = pos_ref[i, 1]
        z = pos_ref[i, 2]
        w = w_ref[i, 0]
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        z0 = jnp.floor(z).astype(jnp.int32)
        fx = x - x0.astype(x.dtype)
        fy = y - y0.astype(y.dtype)
        fz = z - z0.astype(z.dtype)
        zrow = (jnp.where(iota_z == z0 % Z, 1.0 - fz, 0.0)
                + jnp.where(iota_z == (z0 + 1) % Z, fz, 0.0)) * w
        for dx in (0, 1):
            wx = (1.0 - fx) if dx == 0 else fx
            xi = (x0 + dx) % X
            for dy in (0, 1):
                wy = (1.0 - fy) if dy == 0 else fy
                yi = (y0 + dy) % Y
                out_ref[pl.ds(xi * Y + yi, 1), :] += (wx * wy) * zrow
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


def paint_pallas_cic_stream(pos, shape, weights=1.0, chunk=8192):
    """CIC paint with particles streamed through VMEM by the Pallas grid
    pipeline (double-buffered automatically).

    Handles particle counts beyond VMEM; the mesh (X*Y*Z*4 bytes) must still
    fit in VMEM (<~ 12 MB, i.e. up to ~144^3 f32).
    """
    X, Y, Z = (int(s) for s in shape)
    P = int(pos.shape[0])
    pad = (-P) % chunk
    if pad:  # zero-weight padding particles at a valid cell
        pos = jnp.concatenate([pos, jnp.zeros((pad, 3), pos.dtype)], 0)
        wfull = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(weights, pos.dtype), (P,)),
             jnp.zeros((pad,), pos.dtype)], 0)
    else:
        wfull = jnp.broadcast_to(jnp.asarray(weights, pos.dtype), (P,))

    n_chunks = (P + pad) // chunk
    out = pl.pallas_call(
        partial(_paint_grid_kernel, X=X, Y=Y, Z=Z, CHUNK=chunk),
        grid=(n_chunks,),
        out_shape=jax.ShapeDtypeStruct((X * Y, Z), pos.dtype),
        in_specs=[pl.BlockSpec((chunk, 3), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((chunk, 1), lambda c: (c, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((X * Y, Z), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
    )(pos, wfull.reshape(P + pad, 1))
    return out.reshape(X, Y, Z)
