"""Laplace-approximation marginal covariance vs a dense-Hessian reference."""
import numpy as np
from jax import hessian, jacobian, grad, numpy as jnp, random as jr

from montecosmo_tpu.lapprox import (
    hessian_diag, hessian_diag_stochastic, marginal_covariance)


def _quadratic_pot(m, n, seed=0):
    """Gaussian potential with diagonal y-precision and x<->y coupling."""
    k1, k2, k3 = jr.split(jr.key(seed), 3)
    L = jr.normal(k1, (m, m)) * 0.3
    Q = L @ L.T + jnp.eye(m)
    r = 0.5 + jnp.abs(jr.normal(k2, (n,)))
    M = jr.normal(k3, (m, n)) * 0.1

    def pot(x, y):
        return 0.5 * x @ Q @ x + 0.5 * jnp.sum(r * y * y) + x @ (M @ y)

    return pot


def test_marginal_covariance_matches_dense():
    m, n = 4, 37
    pot = _quadratic_pot(m, n)
    x, y = jnp.zeros(m), jnp.zeros(n)

    cov, schur = marginal_covariance(pot, x, y, chunk_size=8, ridge=0.0)

    A = hessian(pot, argnums=0)(x, y)
    B = jacobian(grad(pot, argnums=0), argnums=1)(x, y)
    D = hessian(pot, argnums=1)(x, y)
    H = jnp.block([[A, B], [B.T, D]])
    cov_dense = jnp.linalg.inv(H)[:m, :m]

    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_dense),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(schur), np.asarray(schur).T)


def test_hessian_diag_exact():
    n = 23
    pot = _quadratic_pot(2, n)
    f = lambda y: pot(jnp.ones(2) * 0.1, y)
    y = 0.3 * jnp.arange(n, dtype=float)
    d = hessian_diag(f, y, chunk=7)  # chunk not dividing n: wrap path
    dense = jnp.diag(hessian(f)(y))
    np.testing.assert_allclose(np.asarray(d), np.asarray(dense), rtol=1e-5)


def test_hessian_diag_hutchinson_unbiased():
    n = 16
    pot = _quadratic_pot(2, n, seed=3)
    f = lambda y: pot(jnp.zeros(2), y)
    y = jnp.zeros(n)
    d = hessian_diag_stochastic(f, y, n_probes=512, key=1)
    dense = jnp.diag(hessian(f)(y))
    # for a DIAGONAL y-Hessian Hutchinson is exact (r*r = 1); off-diagonal
    # terms here come only through the coupling, so a loose tolerance holds
    np.testing.assert_allclose(np.asarray(d), np.asarray(dense), rtol=0.05,
                               atol=0.05)
