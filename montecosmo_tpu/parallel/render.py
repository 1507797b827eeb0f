"""Fully decomposed (pod-scale) forward render: white noise -> linear field ->
Zel'dovich displacement -> painted density, with every mesh X-sharded over a
device-mesh axis and all cross-shard traffic on explicit collectives.

This is the config-5 pipeline (SURVEY §6): a mesh too large for one chip
flows through

    pencil rfftn (1 all_to_all)  ->  per-shard Fourier kernels
    -> 3 pencil irfftn gradients ->  per-slab Zel'dovich displacement
    -> halo-exchanged painting (2 ppermute)

without ever materializing a full mesh on one device.  Lattice particles are
slab-owned by construction; the paint halo must cover the largest
displacement (asserted by `max_disp`).

`sharded_bullfrog_steps` extends this with decomposed PM gravity: each DKD
step is halo paint -> pencil Poisson -> halo read, valid while particles stay
within `halo` cells of their owning slab.  Round-2 extensions: 2LPT source
term, periodic particle resort (all_to_all exchange) for long integrations,
and the full bias/RSD observable layer on the sharded layout.
"""
from functools import partial

import numpy as np
import jax
from jax import lax, numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from montecosmo_tpu.ops.background import Background
from montecosmo_tpu.ops.fourier import gradient_hat, invlaplace_hat
from montecosmo_tpu.parallel.fft import (
    _pencil_irfftn_local, _pencil_rfftn_local, pencil_rfftk,
)
from montecosmo_tpu.parallel.halo import halo_paint_local
from montecosmo_tpu.utils.safe import safe_div


def _delta2_local(pot, kvec, axis_name):
    """2LPT source delta2 = sum_{i<j} (h_ii h_jj - h_ij^2) of the potential
    Hessian, on the pencil layout (6 pencil irfftns).  Mirrors the fused
    running-sum form of `ops.pm.pm_forces2`."""
    delta2 = 0.0
    diag_sum = 0.0
    for i in range(3):
        h_ii = _pencil_irfftn_local(gradient_hat(kvec, i) ** 2 * pot, axis_name)
        delta2 += h_ii * diag_sum
        diag_sum += h_ii
        for j in range(i + 1, 3):
            h_ij = gradient_hat(kvec, i) * gradient_hat(kvec, j)
            delta2 -= _pencil_irfftn_local(h_ij * pot, axis_name) ** 2
    return delta2


def sharded_zeldovich_density(white, bg: Background, box_size, a, mesh: Mesh,
                              pow_interp, axis_name="mesh", halo=8,
                              paint_order=2, lpt_order=1):
    """LPT-evolved density from an X-sharded real white-noise mesh.

    white      : (X, Y, Z) real unit-variance white noise, X-sharded.
    pow_interp : callable k -> P(k) [(Mpc/h)^3] (e.g. ops.power.lin_power_interp).
    lpt_order  : 1 (Zel'dovich) or 2 (adds the delta2 displacement via 6
                 Hessian + 1 forward + 3 gradient pencil FFTs).
    Returns the painted (1 + delta) mesh, X-sharded.
    """
    rshape = tuple(int(s) for s in white.shape)
    X, Y, Z = rshape
    growth = bg.a2g(jnp.asarray(a))
    cell_per_box = np.prod(np.divide(rshape, box_size))

    def body(local):
        p = lax.axis_size(axis_name)
        idx = lax.axis_index(axis_name)

        # ---- white -> linear field in Fourier space (Y-sharded pencils)
        k = _pencil_rfftn_local(local, axis_name)
        kvec = pencil_rfftk(rshape, box_size, axis_name)
        kmesh = sum(ki**2 for ki in kvec) ** 0.5
        # rfftn(N(0,I)) has E|.|^2 = n; delta_lin needs E|.|^2 = P(k) n^2/V
        # -> multiply by sqrt(P(k) * n/V)
        lin = k * (pow_interp(kmesh) * cell_per_box) ** 0.5

        # ---- Zel'dovich displacement field (cell units)
        pot = lin * invlaplace_hat(kvec)
        cell = np.divide(box_size, rshape)
        grads = [
            _pencil_irfftn_local(-gradient_hat(kvec, i) * pot, axis_name)
            / jnp.asarray(cell[i], local.dtype)
            for i in range(3)]  # h/Mpc kernels -> cell-unit displacement

        if lpt_order == 2:
            delta2 = _delta2_local(pot, kvec, axis_name)
            pot2 = _pencil_rfftn_local(delta2, axis_name) * invlaplace_hat(kvec)
            growth2 = bg.a2g2(jnp.asarray(a))
            grads2 = [
                _pencil_irfftn_local(-gradient_hat(kvec, i) * pot2, axis_name)
                / jnp.asarray(cell[i], local.dtype)
                for i in range(3)]
            # dpos = D1 * force1 - D2 * force2  (ops.pm.lpt convention)
            grads = [g - (growth2 / growth) * g2
                     for g, g2 in zip(grads, grads2)]

        # ---- slab-owned lattice particles displaced by the local force
        nx_local = X // p
        x0 = (idx * nx_local).astype(jnp.float32)
        ax = x0 + jnp.arange(nx_local, dtype=jnp.float32)
        ay = jnp.arange(Y, dtype=jnp.float32)
        az = jnp.arange(Z, dtype=jnp.float32)
        lattice = jnp.stack(jnp.meshgrid(ax, ay, az, indexing="ij"), -1)
        disp = growth * jnp.stack(grads, -1)
        pos = (lattice + disp).reshape(-1, 3)

        return halo_paint_local(pos, rshape, weights=1.0, order=paint_order,
                                axis_name=axis_name, halo=halo)

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=P(axis_name, None, None),
                       out_specs=P(axis_name, None, None))
    return fn(white)


def sharded_pm_forces_local(pos, rshape, axis_name="mesh", paint_order=2,
                            halo=4, weights=1.0):
    """PM forces at slab-owned particle positions, fully decomposed (call
    inside shard_map): halo paint -> pencil Poisson -> 3 pencil gradient
    irfftns -> halo read.  Cell-unit kernels (matches `ops.pm.pm_forces`
    painting from a tuple)."""
    from montecosmo_tpu.parallel.halo import halo_read_local

    dens = halo_paint_local(pos, rshape, weights=weights, order=paint_order,
                            axis_name=axis_name, halo=halo)
    k = _pencil_rfftn_local(dens, axis_name)
    kvec = pencil_rfftk(rshape, None, axis_name)  # cell units
    pot = k * invlaplace_hat(kvec)
    forces = []
    for i in range(3):
        g = _pencil_irfftn_local(-gradient_hat(kvec, i) * pot, axis_name)
        forces.append(halo_read_local(pos, g, order=paint_order,
                                      axis_name=axis_name, halo=halo))
    return jnp.stack(forces, -1)


def _resort_local(pos, vel, valid, rshape, axis_name, cap_face):
    """Neighbor particle exchange (call inside shard_map): re-own particles
    whose base cell drifted into the next/previous X-slab.

    Fixed-capacity design (static shapes for XLA): each face sends a padded
    (cap_face, 7) buffer [pos, vel, valid] via `ppermute`; the merged set is
    compacted back to the local capacity by a valid-first argsort.  Contract:
    per-resort drift < one slab width (particles that skip a slab are dropped
    — visible as mass loss, never silent corruption).
    Returns (pos, vel, valid) with the same shapes.
    """
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    nx_local = rshape[0] // p
    span = jnp.asarray(rshape, pos.dtype)

    # wrap periodically; park invalid slots at the slab start so downstream
    # paint indexing stays in range (their weight is 0 anyway)
    park = jnp.stack([(idx * nx_local).astype(pos.dtype),
                      jnp.zeros((), pos.dtype), jnp.zeros((), pos.dtype)])
    pos = jnp.where(valid[:, None], pos % span, park)

    owner = (jnp.floor(pos[:, 0]).astype(jnp.int32) % rshape[0]) // nx_local
    shift = (owner - idx) % p
    stay = valid & (shift == 0)
    go_up = valid & (shift == 1)
    go_down = valid & (shift == p - 1)

    def pack(mask):
        order = jnp.argsort(~mask)[:cap_face]  # True slots first
        return pos[order], vel[order], mask[order]

    up = [(i, (i + 1) % p) for i in range(p)]
    down = [(i, (i - 1) % p) for i in range(p)]
    recv_up = [lax.ppermute(b, axis_name, up) for b in pack(go_up)]
    recv_dn = [lax.ppermute(b, axis_name, down) for b in pack(go_down)]

    all_pos = jnp.concatenate([pos, recv_up[0], recv_dn[0]])
    all_vel = jnp.concatenate([vel, recv_up[1], recv_dn[1]])
    all_valid = jnp.concatenate([stay, recv_up[2], recv_dn[2]])
    order = jnp.argsort(~all_valid)[: pos.shape[0]]
    return all_pos[order], all_vel[order], all_valid[order]


def sharded_bullfrog_steps(pos, vel, bg: Background, g0, g1, n_steps, rshape,
                           mesh: Mesh, axis_name="mesh", paint_order=2, halo=4,
                           resort=False, cap_face=None):
    """n BullFrog drift-kick-drift steps on the decomposed layout.

    pos, vel : (P, 3) global cell coordinates/velocities, leading axis sharded
    by slab ownership.  Without `resort`, valid only while every particle
    stays within `halo` cells of its owning slab.  With `resort=True`, a
    fixed-capacity neighbor exchange after every step re-owns migrating
    particles (contract: per-step drift < one slab width; `cap_face` bounds
    the particles crossing one face per step).  The default cap_face is the
    full local count — always safe under the contract but it triples the
    per-shard particle buffer; production runs should set it to a measured
    bound (e.g. 2x the particles within one cell of a face) and check the
    returned `valid` mask for overflow drops.

    Returns (pos, vel) without resort.  With resort, returns
    (pos, vel, valid) where each shard carries 2*cap_face slack slots
    (valid=False, parked at the slab start with weight 0) so slabs with net
    inflow never drop particles; check `valid.sum() == n_particles` for mass
    conservation and paint with `weights=valid`.
    """
    from montecosmo_tpu.ops.pm import alpha_bullfrog

    dg = (g1 - g0) / n_steps
    gs = g0 + dg * jnp.arange(n_steps)

    def body(pos, vel):
        cap = cap_face if cap_face is not None else pos.shape[0]
        valid = lax.pcast(jnp.ones(pos.shape[0], bool), (axis_name,),
                          to="varying")
        if resort:
            # capacity slack: slabs with net inflow must not drop particles
            p = lax.axis_size(axis_name)
            idx = lax.axis_index(axis_name)
            slack = 2 * cap
            park = jnp.stack([(idx * (rshape[0] // p)).astype(pos.dtype),
                              jnp.zeros((), pos.dtype),
                              jnp.zeros((), pos.dtype)])
            pos = jnp.concatenate([pos, jnp.broadcast_to(park, (slack, 3))])
            vel = jnp.concatenate([vel, jnp.zeros((slack, 3), vel.dtype)])
            valid = jnp.concatenate(
                [valid, lax.pcast(jnp.zeros(slack, bool), (axis_name,),
                                  to="varying")])

        def step(state, gstep):
            pos, vel, valid = state
            pos = pos + vel * (dg / 2)
            weights = valid.astype(pos.dtype) if resort else 1.0
            forces = sharded_pm_forces_local(pos, rshape, axis_name,
                                             paint_order, halo, weights)
            alpha = alpha_bullfrog(bg, gstep, dg)
            gmid = gstep + dg / 2
            vel = alpha * vel + (1 - alpha) * forces / gmid
            pos = pos + vel * (dg / 2)
            if resort:
                pos, vel, valid = _resort_local(pos, vel, valid, rshape,
                                                axis_name, cap)
            return (pos, vel, valid), None

        (pos, vel, valid), _ = lax.scan(step, (pos, vel, valid), gs)
        return pos, vel, valid

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(axis_name), P(axis_name)),
                       out_specs=(P(axis_name), P(axis_name), P(axis_name)))
    out = fn(pos, vel)
    return out if resort else out[:2]
