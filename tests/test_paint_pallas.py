"""Pallas CIC paint kernel: exact parity with the XLA scatter path
(interpret mode on CPU; the compiled path is exercised on TPU hardware)."""
import numpy as np
import jax
from jax import numpy as jnp

from montecosmo_tpu.ops.paint import paint
from montecosmo_tpu.ops.paint_pallas import paint_pallas_cic


def test_pallas_cic_matches_xla(rng):
    shape = (8, 8, 8)
    pos = jnp.asarray(rng.uniform(0, 8, (300, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 1.5, 300), jnp.float32)
    ref = paint(pos, shape, weights=w, order=2)
    got = paint_pallas_cic(pos, shape, weights=w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(got.sum()), float(w.sum()), rtol=1e-5)


def test_pallas_cic_wraparound(rng):
    """Particles at the box edge wrap periodically, matching the XLA path."""
    shape = (8, 8, 8)
    pos = jnp.asarray([[7.7, 0.2, 7.9], [0.0, 7.5, 0.1]], jnp.float32)
    ref = paint(pos, shape, order=2)
    got = paint_pallas_cic(pos, shape, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
