"""Pallas lattice-window paint: forward + custom-VJP parity with the XLA
window path (interpret mode; the compiled kernel is benchmarked on hardware).

Parity: reference montecosmo/nbody.py:365-467 via ops.paint_window.
"""
import numpy as np
import jax
from jax import numpy as jnp

from montecosmo_tpu.ops.paint import paint
from montecosmo_tpu.ops.paint_window import paint_window
from montecosmo_tpu.ops.paint_window_pallas import paint_window_pallas

SHAPE = LAT = (16, 16, 16)


def _pos(rng, max_disp=3):
    sites = np.stack(np.meshgrid(*(np.arange(16),) * 3, indexing="ij"),
                     -1).reshape(-1, 3)
    return jnp.asarray(sites + rng.uniform(-max_disp, max_disp, sites.shape),
                       jnp.float32)


def test_pallas_paint_forward_parity(rng):
    pos = _pos(rng)
    w = jnp.asarray(rng.uniform(0.5, 2.0, len(pos)), jnp.float32)
    for order in (2, 3, 4):
        ref = paint(pos % 16.0, SHAPE, w, order)
        got = paint_window_pallas(pos, SHAPE, LAT, w, order, max_disp=3,
                                  group=(4, 4, None), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=str(order))


def test_pallas_paint_grad_parity(rng):
    pos = _pos(rng)
    w = jnp.asarray(rng.uniform(0.5, 2.0, len(pos)), jnp.float32)
    probe = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    for order in (2, 3):
        g_ref = jax.grad(lambda p, w: jnp.vdot(paint_window(
            p, SHAPE, LAT, w, order, max_disp=3, clip=True), probe),
            (0, 1))(pos, w)
        g_pl = jax.grad(lambda p, w: jnp.vdot(paint_window_pallas(
            p, SHAPE, LAT, w, order, max_disp=3, group=(4, 4, None),
            interpret=True), probe), (0, 1))(pos, w)
        for r, g, name in zip(g_ref, g_pl, ("pos", "w")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"{order} {name}")


def test_pallas_clip_conserves_mass(rng):
    pos = _pos(rng).at[:5].add(jnp.asarray([9.0, -11.0, 13.0]))
    w = jnp.asarray(rng.uniform(0.5, 2.0, len(pos)), jnp.float32)
    mesh = paint_window_pallas(pos, SHAPE, LAT, w, 2, max_disp=3,
                               group=(4, 4, None), clip=True, interpret=True)
    np.testing.assert_allclose(float(mesh.sum()), float(w.sum()), rtol=1e-5)
