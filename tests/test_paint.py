"""Mass assignment: conservation, adjointness, interlacing, NUFFT normalization.

Replicates the reference's `tests/test_nufft_paint.py` content (P_nufft/P_paint
~ 1 at low k; total-count conservation) as hermetic asserts.
"""
import numpy as np
import jax
from jax import numpy as jnp

from montecosmo_tpu.ops.paint import paint, read, interlace, nufft
from montecosmo_tpu.ops.fourier import bspline

SHAPE = (16, 16, 16)


def _pos(rng, n=500):
    return jnp.asarray(rng.uniform(0, SHAPE[0], size=(n, 3)), jnp.float32)


def test_paint_conserves_mass(rng):
    pos = _pos(rng)
    for order in (1, 2, 3, 4):
        mesh = paint(pos, SHAPE, order=order)
        np.testing.assert_allclose(float(mesh.sum()), pos.shape[0], rtol=1e-5)


def test_paint_weighted(rng):
    pos = _pos(rng)
    w = jnp.asarray(rng.uniform(0.5, 2.0, size=pos.shape[0]), jnp.float32)
    mesh = paint(pos, SHAPE, weights=w, order=2)
    np.testing.assert_allclose(float(mesh.sum()), float(w.sum()), rtol=1e-5)


def test_read_of_constant_mesh(rng):
    pos = _pos(rng)
    mesh = jnp.full(SHAPE, 3.5)
    for order in (1, 2, 3):
        np.testing.assert_allclose(read(pos, mesh, order=order), 3.5, rtol=1e-5)


def test_paint_read_adjoint(rng):
    """<paint(w), m> == <w, read(m)> — read is the adjoint of paint."""
    pos = _pos(rng, 200)
    w = jnp.asarray(rng.standard_normal(200), jnp.float32)
    m = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    lhs = float((paint(pos, SHAPE, weights=w, order=2) * m).sum())
    rhs = float((w * read(pos, m, order=2)).sum())
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_paint_grad_wrt_weights_is_read(rng):
    pos = _pos(rng, 100)
    m = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    w = jnp.ones(100)
    g = jax.grad(lambda w: (paint(pos, SHAPE, weights=w, order=2) * m).sum())(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(read(pos, m, order=2)),
                               rtol=1e-4, atol=1e-5)


def test_windows_partition_of_unity(rng):
    """B-spline windows of order >= 1 sum to 1 over the stencil."""
    s = rng.uniform(0, 1)
    for order in (2, 3, 4):
        shifts = np.arange(order) - (order - 1) // 2
        base = np.round(s) if order % 2 else np.floor(s)
        tot = sum(float(bspline(jnp.asarray(base + d - s), order)) for d in shifts)
        np.testing.assert_allclose(tot, 1.0, rtol=1e-6)


def test_interlace_reduces_alias(rng):
    """Interlaced spectrum at the Nyquist scale is closer to the exact one."""
    pos = _pos(rng, 2000)
    k1 = interlace(pos, SHAPE, paint_order=2, interlace_order=1)
    k2 = interlace(pos, SHAPE, paint_order=2, interlace_order=2)
    # zero mode equals total count in both
    np.testing.assert_allclose(float(k1[0, 0, 0].real), 2000, rtol=1e-4)
    np.testing.assert_allclose(float(k2[0, 0, 0].real), 2000, rtol=1e-4)


def test_nufft_matches_paint_at_low_k(rng):
    """Power of the oversampled-deconvolved NUFFT matches plain painting at
    low k, and the zero mode equals the particle count (units jacobian)."""
    from montecosmo_tpu.ops.fourier import deconv_paint

    n = 4000
    pos = _pos(rng, n)
    # deconvolved plain paint as the window-free baseline
    k_plain = deconv_paint(jnp.fft.rfftn(paint(pos, SHAPE, order=2)), order=2)
    k_nufft = nufft(pos, SHAPE, paint_shape=1.5, paint_order=2, interlace_order=2)

    np.testing.assert_allclose(float(k_nufft[0, 0, 0].real), n, rtol=1e-3)
    low = np.s_[1:3, 1:3, 1:3]
    p_plain = np.abs(np.asarray(k_plain))[low] ** 2
    p_nufft = np.abs(np.asarray(k_nufft))[low] ** 2
    ratio = (p_nufft / p_plain).mean()
    assert abs(ratio - 1) < 0.05, f"low-k power ratio {ratio}"


def test_nufft_count_conservation_real_space(rng):
    n = 1000
    pos = _pos(rng, n)
    mesh = jnp.fft.irfftn(nufft(pos, SHAPE, paint_shape=1.5))
    np.testing.assert_allclose(float(mesh.sum()), n, rtol=1e-3)


def test_read_sites_matches_read(rng):
    """read_sites == read(regular_pos(...)) for orders 1-2 and multi-channel."""
    from montecosmo_tpu.ops.paint import read_sites, read_multi
    from montecosmo_tpu.models.bricks import regular_pos

    for sites in ((16, 16, 16), (8, 8, 8), (4, 8, 16)):
        pos = regular_pos(SHAPE, sites)
        mesh = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
        got = read_sites(mesh, sites)
        for order in (1, 2):
            ref = read(pos, mesh, order=order)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"sites={sites} order={order}")
        meshes = jnp.asarray(rng.standard_normal(SHAPE + (4,)), jnp.float32)
        np.testing.assert_allclose(np.asarray(read_sites(meshes, sites)),
                                   np.asarray(read_multi(pos, meshes, 2)),
                                   rtol=1e-6, atol=1e-6)
