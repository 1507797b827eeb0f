"""Uniform-grid interpolation: parity with jnp.interp, edges, gradients,
and the Background chi2a inverse-table accuracy.

Parity: these replace jnp.interp call sites (reference montecosmo
bricks.py:108-157, nbody.py:750-896) — semantics must match.
"""
import numpy as np
import jax
from jax import numpy as jnp

from montecosmo_tpu.ops.interp import (
    is_uniform, log_uniform_interp_fn, uniform_interp,
)


def test_log_uniform_matches_jnp_interp(rng):
    ks = np.logspace(-4, 1, 256)
    ys = jnp.asarray(np.sin(np.log(ks)) + 2.0, jnp.float32)
    x = jnp.asarray(10 ** rng.uniform(-4.5, 1.5, size=(37, 23)), jnp.float32)
    ref = jnp.interp(x.reshape(-1), jnp.asarray(ks, jnp.float32), ys,
                     left=0.0, right=0.0).reshape(x.shape)
    got = log_uniform_interp_fn(ks, ys)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_edges_and_scalars():
    ks = np.logspace(-4, 1, 64)
    ys = jnp.arange(64, dtype=jnp.float32)
    fn = log_uniform_interp_fn(ks, ys)
    edges = fn(jnp.asarray([0.0, 1e-30, 5e-5, 2e1], jnp.float32))
    np.testing.assert_array_equal(np.asarray(edges), 0.0)  # left/right = 0
    # python-scalar query
    assert np.isfinite(float(fn(0.1)))
    # clamp semantics without explicit left/right
    y = uniform_interp(jnp.asarray([-5.0, 100.0]), 0.0, 1.0, ys)
    np.testing.assert_array_equal(np.asarray(y), [0.0, 63.0])


def test_non_uniform_nodes_resampled(rng):
    ks = np.sort(rng.uniform(1e-3, 5.0, 300))
    ys = jnp.asarray(np.cos(ks), jnp.float32)
    assert not is_uniform(ks, logx=True)
    x = jnp.asarray(10 ** rng.uniform(-3.2, 0.8, size=500), jnp.float32)
    got = log_uniform_interp_fn(ks, ys)(x)
    ref = jnp.interp(x, jnp.asarray(ks, jnp.float32), ys, left=0.0, right=0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3)


def test_grad_flows_to_table(rng):
    ks = np.logspace(-2, 1, 128)
    ys = jnp.asarray(rng.standard_normal(128), jnp.float32)
    x = jnp.asarray(10 ** rng.uniform(-2, 1, size=200), jnp.float32)
    g = jax.grad(lambda y: log_uniform_interp_fn(ks, y)(x).sum())(ys)
    g = np.asarray(g)
    assert np.isfinite(g).all() and g.sum() > 0  # partition of unity-ish


def test_multichannel_table(rng):
    ys = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 63, size=40), jnp.float32)
    y = uniform_interp(x, 0.0, 1.0, ys)
    assert y.shape == (40, 3)
    for c in range(3):
        ref = jnp.interp(x, jnp.arange(64, dtype=jnp.float32), ys[:, c])
        np.testing.assert_allclose(np.asarray(y[:, c]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_background_chi2a_inverse(rng):
    """chi2a on the static uniform grid inverts a2chi to sub-cell accuracy."""
    from montecosmo_tpu.ops.background import Background, get_cosmology

    bg = Background.create(get_cosmology(Omega_m=0.3111, sigma8=0.8102))
    a = jnp.asarray(rng.uniform(0.05, 1.0, size=1000), jnp.float32)
    chi = bg.a2chi(a)
    a_rt = bg.chi2a(chi)
    np.testing.assert_allclose(np.asarray(a_rt), np.asarray(a),
                               rtol=2e-3, atol=2e-4)
