"""Decomposed field diagnostics: power spectrum of an X-sharded mesh without
ever gathering it — local pencil FFT, per-shard binned reductions, one psum.

Matches `metrics.spectrum` (monopole, include_corners=True) bin for bin; the
k-bin edges use the same convention as `metrics._waves` but are computed in
closed form so no full-size |k| mesh is ever materialized on the host.

Parity: reference metrics.py:16-110 (spectrum), re-architected for
jax.sharding (the reference gathers the mesh to one process).
"""
import numpy as np
import jax
from jax import lax, numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from montecosmo_tpu.parallel.fft import _pencil_rfftn_local, pencil_rfftk


def _default_kedges(rshape, box_size, kedges=None):
    """Same convention as metrics._waves (include_corners=True), closed form:
    kmax = |(pi N / B)|, bin width sqrt(d) k_fund by default."""
    box = np.broadcast_to(np.asarray(box_size, float), (len(rshape),))
    kmin = 0.0
    kmax = float(np.linalg.norm(np.pi * np.asarray(rshape) / box))
    if isinstance(kedges, (type(None), int, float)):
        if kedges is None:
            dk = len(rshape) ** 0.5 * 2 * np.pi / box.min()
            n_kedges = max(int((kmax - kmin) / dk), 1)
        elif isinstance(kedges, int):
            n_kedges = kedges
        else:
            n_kedges = max(int((kmax - kmin) / kedges), 1)
        dk = (kmax - kmin) / n_kedges
        kedges = np.linspace(kmin, kmax, n_kedges, endpoint=False) + dk / 2
    return np.asarray(kedges)


def sharded_spectrum(x, box_size, mesh: Mesh, kedges=None, axis_name="mesh"):
    """Monopole auto power spectrum of an X-sharded real mesh.

    Returns (k_mean, P(k)) as replicated arrays, in (Mpc/h) units; bins with
    zero modes return NaN (matching metrics.spectrum's 0/0 behavior).
    """
    rshape = tuple(int(s) for s in x.shape)
    box = np.broadcast_to(np.asarray(box_size, float), (3,))
    kedges_arr = _default_kedges(rshape, box, kedges)
    n_bins = len(kedges_arr) + 1

    def body(local):
        k = _pencil_rfftn_local(local, axis_name)
        kvec = pencil_rfftk(rshape, box, axis_name)
        kmesh = sum(ki**2 for ki in kvec) ** 0.5
        kmesh = jnp.broadcast_to(kmesh, k.shape)

        # Hermitian double-count weights along the rfft (z) axis
        wz = jnp.full((k.shape[-1],), 2.0, k.real.dtype)
        wz = wz.at[0].set(1.0)
        if rshape[-1] % 2 == 0:
            wz = wz.at[-1].set(1.0)
        w = jnp.broadcast_to(wz, k.shape)

        dig = jnp.digitize(kmesh.reshape(-1), jnp.asarray(kedges_arr))
        mmk = (k.real**2 + k.imag**2).reshape(-1)
        w = w.reshape(-1)
        kcount = jnp.bincount(dig, weights=w, length=n_bins)
        ksum = jnp.bincount(dig, weights=(kmesh.reshape(-1) * w), length=n_bins)
        psum = jnp.bincount(dig, weights=mmk * w, length=n_bins)
        return lax.psum(jnp.stack([kcount, ksum, psum]), axis_name)

    fn = jax.jit(jax.shard_map(body, mesh=mesh,
                               in_specs=P(axis_name, None, None),
                               out_specs=P()))
    kcount, ksum, psum = fn(x)
    kcount, ksum, psum = (np.asarray(v)[1:-1] for v in (kcount, ksum, psum))
    kmean = ksum / kcount
    pows = psum * np.prod(box / np.asarray(rshape) ** 2) / kcount
    return kmean, pows
