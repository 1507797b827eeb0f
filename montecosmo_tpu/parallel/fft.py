"""Pencil-decomposed distributed 3D real FFT over a device-mesh axis.

The keystone absent from the reference (its acknowledged TODO at
`run/script_pipe_fpm.py:413,417`): one mesh never spans devices there.  Here a
3D rfftn over an X-sharded mesh costs two local 1D FFT passes and ONE
`all_to_all` transpose over ICI:

    input  layout: X-sharded   (X/P, Y, Z)      real
    1. local rfft over Z, fft over Y            (X/P, Y, Hz+1) complex
    2. all_to_all: split Y, concat X  ->        (X,  Y/P, Hz+1)
    3. local fft over X
    output layout: Y-sharded   (X, Y/P, Hz+1)   complex

The inverse reverses the pipeline.  Fourier-space filters act on the
Y-sharded layout with per-shard wavevector slices (`pencil_rfftk`).

Functions are written for use INSIDE `shard_map` over a 1D mesh axis; thin
jit wrappers are provided for whole-array calls.
"""
from functools import partial

import numpy as np
import jax
from jax import lax, numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from montecosmo_tpu.ops.fourier import gradient_hat, invlaplace_hat
from montecosmo_tpu.utils.safe import safe_div


# ----------------------------------------------------------------- shard-local ops
def _pencil_rfftn_local(x, axis_name):
    """Body of the distributed rfftn (call inside shard_map).

    x : (X/P, Y, Z) real, X-sharded.  Returns (X, Y/P, Hz+1), Y-sharded.
    """
    k = jnp.fft.rfft(x, axis=2)
    k = jnp.fft.fft(k, axis=1)
    # transpose the pencil: gather X, scatter Y
    k = lax.all_to_all(k, axis_name, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(k, axis=0)


def _pencil_irfftn_local(k, axis_name):
    """Inverse: (X, Y/P, Hz+1) Y-sharded -> (X/P, Y, Z) X-sharded real."""
    k = jnp.fft.ifft(k, axis=0)
    k = lax.all_to_all(k, axis_name, split_axis=0, concat_axis=1, tiled=True)
    k = jnp.fft.ifft(k, axis=1)
    return jnp.fft.irfft(k, axis=2)


def pencil_rfftk(rshape, box_size=None, axis_name="mesh", dtype=np.float32):
    """Per-shard wavevectors for the Y-sharded pencil layout (call inside
    shard_map): kx full, ky the local Y/P slice, kz the rfft axis."""
    dim = len(rshape)
    scales = (dim * (2 * np.pi,) if box_size is None
              else tuple(2 * np.pi * s / b for s, b in zip(rshape, box_size)))
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    kx = jnp.asarray((np.fft.fftfreq(rshape[0]) * scales[0]).astype(dtype)
                     ).reshape(-1, 1, 1)
    ky_full = jnp.asarray((np.fft.fftfreq(rshape[1]) * scales[1]).astype(dtype))
    ny_local = rshape[1] // p
    ky = lax.dynamic_slice(ky_full, (idx * ny_local,), (ny_local,)).reshape(1, -1, 1)
    kz = jnp.asarray((np.fft.rfftfreq(rshape[2]) * scales[2]).astype(dtype)
                     ).reshape(1, 1, -1)
    return kx, ky, kz


# ----------------------------------------------------------------- jit wrappers
def pencil_rfftn(x, mesh: Mesh, axis_name="mesh"):
    """Distributed rfftn of an X-sharded real mesh.

    Accepts/returns global jax.Arrays; input sharded P(axis_name, None, None),
    output sharded P(None, axis_name, None).
    """
    fn = jax.shard_map(partial(_pencil_rfftn_local, axis_name=axis_name),
                       mesh=mesh,
                       in_specs=P(axis_name, None, None),
                       out_specs=P(None, axis_name, None))
    return fn(x)


def pencil_irfftn(k, mesh: Mesh, axis_name="mesh"):
    """Distributed irfftn of a Y-sharded rfft mesh -> X-sharded real mesh."""
    fn = jax.shard_map(partial(_pencil_irfftn_local, axis_name=axis_name),
                       mesh=mesh,
                       in_specs=P(None, axis_name, None),
                       out_specs=P(axis_name, None, None))
    return fn(k)


def sharded_poisson_forces_mesh(delta, mesh: Mesh, axis_name="mesh",
                                box_size=None):
    """Distributed PM force meshes: Poisson-solve an X-sharded density contrast
    and return the 3 force component meshes (X-sharded), all under one
    shard_map — 4 distributed FFTs, 2 all_to_all per FFT direction pair.
    """
    rshape = delta.shape

    def body(local):
        k = _pencil_rfftn_local(local, axis_name)
        kvec = pencil_rfftk(rshape, box_size, axis_name)
        pot = k * invlaplace_hat(kvec)
        forces = [
            _pencil_irfftn_local(-gradient_hat(kvec, i) * pot, axis_name)
            for i in range(3)]
        return tuple(forces)

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=P(axis_name, None, None),
                       out_specs=(P(axis_name, None, None),) * 3)
    return jnp.stack(fn(delta), axis=-1)
