"""Laplace approximation: marginal covariance of scalar parameters given a
large field, without forming the field Hessian.

For H = nabla^2 U(x, y) = [[A, B], [B^T, D]] the marginal covariance on x is
Cov_x = (A - B D^-1 B^T)^-1.  Assuming D diagonal, diag(D) comes from
double-jvp probes (exact, chunked) or Hutchinson probes, and B D^-1 B^T is
assembled from m Hessian-vector products — the field dimension n never
materializes a matrix.

Parity: reference `montecosmo/lapprox.py:4-96`.
"""
from functools import partial

from jax import grad, hessian, jvp, lax, linearize, numpy as jnp, random as jr, vmap


def cov_x_from_pot_x_y(pot_fn, x, y, method="exact", chunk_size=None,
                       eps_diag=1e-9):
    """Marginal covariance on x of exp(-U(x, y)) at the mode (x, y).

    pot_fn : (x (m,), y (n,)) -> scalar potential.
    method : 'exact' (chunked double-jvp diag) or 'hutchinson'.
    Returns (cov_x (m, m), schur complement (m, m)).
    """
    m = x.shape[0]
    n = y.shape[0]

    A = hessian(pot_fn, argnums=0)(x, y)

    if chunk_size is None:
        chunk_size = n
    if method == "exact":
        diag_D = hess_diag_in_chunks(partial(pot_fn, x), y, chunk_size=chunk_size)
    elif method == "hutchinson":
        diag_D = hess_diag_hutchinson(partial(pot_fn, x), y, n_probes=chunk_size)
    else:
        raise ValueError(method)
    diag_Dinv = 1.0 / (diag_D + eps_diag)

    def BDinvBT_matvec(v):
        # u = B^T v via grad_y of <grad_x U, v>; then B (D^-1 u) via grad_x
        scalar_s = lambda xx, yy: jnp.vdot(grad(pot_fn, argnums=0)(xx, yy), v)
        u = grad(scalar_s, argnums=1)(x, y)
        u_scaled = u * diag_Dinv
        scalar_t = lambda xx, yy: jnp.vdot(grad(pot_fn, argnums=1)(xx, yy), u_scaled)
        return grad(scalar_t, argnums=0)(x, y)

    BDinvBT = vmap(BDinvBT_matvec)(jnp.eye(m)).T
    schur = A - BDinvBT
    schur = (schur + schur.T) / 2
    return jnp.linalg.inv(schur), schur


def hess_diag_in_chunks(pot_fn, y, chunk_size=64):
    """Exact Hessian diagonal by chunked double-jvp along basis vectors."""

    def body(_, ids):
        def per_k(k):
            e = jnp.zeros_like(y).at[k].set(1.0)
            _, out = jvp(lambda yy: jvp(pot_fn, (yy,), (e,))[1], (y,), (e,))
            return out

        return None, vmap(per_k)(ids)

    n = y.shape[0]
    n_chunks = (n + chunk_size - 1) // chunk_size
    ids = jnp.pad(jnp.arange(n), (0, n_chunks * chunk_size - n))
    ids = jnp.stack(jnp.split(ids, n_chunks))
    _, diag = lax.scan(body, None, ids)
    return diag.reshape(-1)[:n]


def hess_diag_hutchinson(pot_fn, y, n_probes=64, seed=42):
    """Stochastic Hessian diagonal: E[r * (H r)] over Rademacher probes."""
    if isinstance(seed, int):
        seed = jr.key(seed)
    seeds = jr.split(seed, n_probes)
    _, hvp = linearize(grad(pot_fn), y)

    def body(diag, key):
        r = jr.rademacher(key, y.shape, dtype=y.dtype)
        return diag + r * hvp(r) / n_probes, None

    diag, _ = lax.scan(body, jnp.zeros_like(y), seeds)
    return diag
