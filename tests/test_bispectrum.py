"""FFT-based binned bispectrum estimator (metrics.bispectrum).

Exactness: brute-force triangle sum over the full discrete mode grid.
Physics: the tree-level bispectrum of a local quadratic field.
The reference leaves bispectrum support as a TODO (reference model.py:60).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montecosmo_tpu.metrics import kbin_edges, bispectrum


def _brute_force(mesh, box, kedges_spec):
    """Vectorized exact triangle sums over the full fft grid.

    Returns ({(i,j,l): sum ddd}, {(i,j,l): count}) for ordered bin triples.
    """
    N = mesh.shape[0]
    d = np.fft.fftn(mesh).reshape(-1)
    freq = (np.fft.fftfreq(N) * N).astype(int)
    kx, ky, kz = np.meshgrid(freq, freq, freq, indexing="ij")
    kf = 2 * np.pi / box[0]
    kmag = np.sqrt(kx**2 + ky**2 + kz**2) * kf
    kedges = kbin_edges((N,) * 3, np.asarray(box), kedges_spec, False)
    n_bins = len(kedges) - 1
    dig = np.digitize(kmag, kedges).reshape(-1)          # bin b -> dig b+1
    idx = np.stack([kx, ky, kz], -1).astype(int).reshape(-1, 3)

    keep = (dig >= 1) & (dig <= n_bins)
    sel = np.nonzero(keep)[0]
    d1, dig1, idx1 = d[sel], dig[sel], idx[sel]
    M = len(sel)

    # all pairs; k3 = -(k1 + k2) looked up on the full grid
    k3 = -(idx1[:, None, :] + idx1[None, :, :])          # (M, M, 3)
    flat3 = np.ravel_multi_index(
        tuple(np.moveaxis(k3 % N, -1, 0)), (N, N, N)).reshape(-1)
    dig3 = np.digitize(kmag.reshape(-1)[flat3], kedges)
    ok = (dig3 >= 1) & (dig3 <= n_bins)

    vals = (d1[:, None] * d1[None, :]).reshape(-1)[ok] * d[flat3[ok]]
    b1 = np.repeat(dig1 - 1, M)[ok]
    b2 = np.tile(dig1 - 1, M)[ok]
    b3 = dig3[ok] - 1

    nums, dens = {}, {}
    lin = (b1 * n_bins + b2) * n_bins + b3
    for key in np.unique(lin):
        m = lin == key
        tri = (key // n_bins**2, (key // n_bins) % n_bins, key % n_bins)
        nums[tri] = float(np.sum(vals[m].real))
        dens[tri] = int(np.sum(m))
    return nums, dens


def test_bispectrum_matches_brute_force():
    rng = np.random.default_rng(0)
    N, box = 8, (16.0,) * 3
    mesh = rng.normal(size=(N,) * 3)
    kmean, triples, bs, kcount = bispectrum(jnp.asarray(mesh),
                                            box_size=box, kedges=7)
    nums, dens = _brute_force(mesh, box, 7)

    V = np.prod(box)
    checked = 0
    for t, bval in zip(np.asarray(triples), np.asarray(bs)):
        tri = tuple(int(x) for x in t)
        if dens.get(tri, 0) == 0:
            assert bval == 0.0  # safe_div of an empty triangle bin
            continue
        brute = V**2 / N**9 * nums[tri] / dens[tri]
        np.testing.assert_allclose(bval, brute, rtol=1e-3, atol=1e-8)
        checked += 1
    assert checked >= 20


def test_bispectrum_local_quadratic_tree_level():
    """delta = g + fnl (g^2 - <g^2>) with white g has tree-level
    B = 2 fnl [P(k1) P(k2) + cyc] = 6 fnl P^2 (P constant for white noise)."""
    N, box, fnl = 32, (64.0,) * 3, 0.05
    V = float(np.prod(box))
    P = V / N**3                                         # white-noise power
    expect = 6 * fnl * P**2

    @jax.jit
    def measure(g):
        delta = g + fnl * (g**2 - jnp.mean(g**2))
        _, triples, bs, _ = bispectrum(delta, box_size=box, kedges=6)
        return triples, bs

    rng = np.random.default_rng(1)
    acc = []
    for _ in range(8):
        g = jnp.asarray(rng.normal(size=(N,) * 3).astype(np.float32))
        triples, bs = measure(g)
        acc.append(np.asarray(bs))
    meas = np.mean(acc, axis=0)

    # pool triples (all have the same expectation for white noise)
    pooled = np.mean(meas)
    assert np.isclose(pooled, expect, rtol=0.25), (pooled, expect)


def test_bispectrum_gaussian_is_small():
    """A Gaussian field's bispectrum is zero in the mean: the pooled
    estimate must be much smaller than the quadratic field's signal."""
    N, box = 32, (64.0,) * 3
    P = float(np.prod(box)) / N**3
    rng = np.random.default_rng(2)

    @jax.jit
    def measure(g):
        return bispectrum(g, box_size=box, kedges=6)[2]

    acc = [np.asarray(measure(jnp.asarray(
        rng.normal(size=(N,) * 3).astype(np.float32)))) for _ in range(16)]
    pooled = abs(np.mean(np.mean(acc, axis=0)))
    # scatter-limited null: must stay well below the fnl=0.05 signal pooled
    # the same way (~19.2 here); per-triple scatter is ~14/sqrt(16)
    assert pooled < 0.4 * 6 * 0.05 * P**2
