"""PM gravity engine: LPT vs linear theory, BullFrog vs Zel'dovich, gradients.

Hermetic versions of the reference's `tests_old/test_fastpm.py` and
`valid_nbody` notebook checks.
"""
import numpy as np
import jax
from jax import numpy as jnp

from montecosmo_tpu.ops.background import Background, Planck18, Cosmology
from montecosmo_tpu.ops.paint import paint
from montecosmo_tpu.ops.pm import (pm_forces, lpt, nbody_bf,
                                   nbody_bf_lightcone, nbody_bf_scan)
from montecosmo_tpu.ops.power import lin_power_mesh
from montecosmo_tpu.ops.hermitian import rg2cgh
from montecosmo_tpu.models.bricks import regular_pos

SHAPE = (16, 16, 16)
BOX = (200.0, 200.0, 200.0)


def make_linear_field(rng, amplitude=1.0):
    """Small-amplitude Gaussian field with a cosmological spectrum, in cell
    units (delta contrast), returned as rfft mesh."""
    cosmo = Planck18()
    white = rg2cgh(jnp.asarray(rng.standard_normal(SHAPE), jnp.float32))
    pmesh = lin_power_mesh(cosmo, SHAPE, BOX)
    cell_vol = np.prod(np.divide(BOX, SHAPE))
    lin = white * (pmesh / cell_vol) ** 0.5 * amplitude
    return cosmo, lin


def test_pm_forces_zero_for_uniform_density():
    pos = regular_pos(SHAPE)
    meshk = jnp.fft.rfftn(jnp.ones(SHAPE))
    f = pm_forces(pos, meshk, read_order=2)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-4)


def test_lpt_small_amplitude_matches_linear_theory(rng):
    """Painted 1LPT density at scale factor a reproduces D(a) * delta_lin at
    low k (Zel'dovich linearization)."""
    cosmo, lin = make_linear_field(rng, amplitude=0.1)
    bg = Background.create(cosmo)
    pos = regular_pos(SHAPE)
    a = 0.5

    dpos, vel = lpt(bg, lin, pos, a=a, lpt_order=1, read_order=1)
    delta_lpt = paint(pos + dpos, SHAPE, order=2) - 1.0
    delta_lin = jnp.fft.irfftn(lin) * bg.a2g(a)

    k_lpt = np.asarray(jnp.fft.rfftn(delta_lpt))
    k_lin = np.asarray(jnp.fft.rfftn(delta_lin))
    low = np.s_[1:3, 1:3, 1:3]
    ratio = (k_lpt[low] / k_lin[low]).real.mean()
    assert abs(ratio - 1) < 0.1, ratio


def test_2lpt_reduces_to_1lpt_at_small_amplitude(rng):
    cosmo, lin = make_linear_field(rng, amplitude=0.01)
    bg = Background.create(cosmo)
    pos = regular_pos(SHAPE)
    d1, _ = lpt(bg, lin, pos, a=1.0, lpt_order=1, read_order=1)
    d2, _ = lpt(bg, lin, pos, a=1.0, lpt_order=2, read_order=1)
    # 2LPT correction is second order in the field amplitude
    rel = float(jnp.linalg.norm(d2 - d1) / jnp.linalg.norm(d1))
    assert rel < 0.05, rel


def test_bullfrog_matches_lpt_zeldovich_limit(rng):
    """BullFrog is exact on Zel'dovich trajectories: for a single low-k mode
    of tiny amplitude (negligible paint-window damping), a few steps reproduce
    the LPT displacement."""
    cosmo = Planck18()
    bg = Background.create(cosmo)
    pos = regular_pos(SHAPE)

    # single fundamental mode along x, amplitude 0.02
    delta = 0.02 * jnp.cos(2 * np.pi * jnp.arange(SHAPE[0]) / SHAPE[0])
    lin = jnp.fft.rfftn(jnp.broadcast_to(delta[:, None, None], SHAPE))

    d_lpt, _ = lpt(bg, lin, pos, a=1.0, lpt_order=2, read_order=1)
    mask = jnp.abs(d_lpt) > 1e-4
    for n_steps in (1, 4):
        (pos_nb, _) = nbody_bf(bg, lin, pos, a0=0.0, a1=1.0, n_steps=n_steps,
                               lpt_order=2)
        d_nb = pos_nb[-1] - pos
        # pointwise errors at the CIC one-sided-difference level are intrinsic
        # to discrete painting (identical in any CIC PM); assert statistical
        # agreement: mean ratio and rms within a few percent
        ratio = float((d_nb / d_lpt)[mask].mean())
        rms = float(jnp.linalg.norm(d_nb) / jnp.linalg.norm(d_lpt))
        assert abs(ratio - 1) < 0.05, (n_steps, ratio)
        assert abs(rms - 1) < 0.05, (n_steps, rms)


def test_nbody_snapshots(rng):
    cosmo, lin = make_linear_field(rng, amplitude=0.1)
    bg = Background.create(cosmo)
    pos = regular_pos(SHAPE)
    ps, vs = nbody_bf(bg, lin, pos, a0=0.0, a1=1.0, n_steps=4, snapshots=3)
    assert ps.shape[0] == 3
    # growth of structure: displacement grows monotonically
    disp = np.asarray(jnp.abs(ps - pos[None]).mean((1, 2)))
    assert disp[0] < disp[-1]


def test_nbody_grad_flows(rng):
    """End-to-end reverse-mode gradient through the checkpointed N-body."""
    cosmo, lin = make_linear_field(rng, amplitude=0.1)
    bg = Background.create(cosmo)
    pos = regular_pos(SHAPE)

    def loss(lin_r):
        link = jnp.fft.rfftn(lin_r)
        p, v = nbody_bf(bg, link, pos, a0=0.0, a1=1.0, n_steps=3)
        mesh = paint(p[-1], SHAPE, order=2)
        return (mesh**2).mean()

    g = jax.grad(loss)(jnp.fft.irfftn(lin))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_nbody_lightcone_endpoint_exact(rng):
    """g_tgt = g(a1) for every particle: the light-cone blend puts hat weight
    1 on the final step boundary, reproducing the nbody_bf endpoint (same
    step sequence; neighbor hat weights leak at most one f32 ulp)."""
    cosmo, lin = make_linear_field(rng, amplitude=0.1)
    bg = Background.create(cosmo)
    pos = regular_pos(SHAPE)
    p_ref, v_ref = nbody_bf(bg, lin, pos, a0=0.0, a1=1.0, n_steps=4)
    g1 = bg.a2g(jnp.asarray(1.0))
    g_tgt = jnp.full(pos.shape[:-1] + (1,), g1)
    p_lc, v_lc = nbody_bf_lightcone(bg, lin, pos, g_tgt, a0=0.0, a1=1.0,
                                    n_steps=4)
    np.testing.assert_allclose(np.asarray(p_lc), np.asarray(p_ref[-1]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_lc), np.asarray(v_ref[-1]),
                               rtol=1e-5, atol=1e-5)


def test_nbody_lightcone_boundary_node(rng):
    """g_tgt exactly at an interior step boundary reproduces that snapshot
    state: the hat weights select the node exactly."""
    cosmo, lin = make_linear_field(rng, amplitude=0.1)
    bg = Background.create(cosmo)
    pos = regular_pos(SHAPE)
    n_steps = 4
    g0, g1 = bg.a2g(jnp.asarray(0.0)), bg.a2g(jnp.asarray(1.0))
    dg = (g1 - g0) / n_steps
    # snapshot at every step end, pick node 2 (end of step 2)
    ps, vs = nbody_bf(bg, lin, pos, a0=0.0, a1=1.0, n_steps=n_steps,
                      snapshots=[float(bg.g2a(g0 + 2 * dg))])
    g_tgt = jnp.full(pos.shape[:-1] + (1,), g0 + 2 * dg)
    p_lc, v_lc = nbody_bf_lightcone(bg, lin, pos, g_tgt, a0=0.0, a1=1.0,
                                    n_steps=n_steps)
    np.testing.assert_allclose(np.asarray(p_lc), np.asarray(ps[0]),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_lc), np.asarray(vs[0]),
                               rtol=0, atol=1e-4)


def test_nbody_lightcone_grad_flows(rng):
    cosmo, lin = make_linear_field(rng, amplitude=0.1)
    bg = Background.create(cosmo)
    pos = regular_pos(SHAPE)
    g1 = bg.a2g(jnp.asarray(1.0))
    g_tgt = (jnp.linspace(0.2, 1.0, pos.shape[0]) * g1).reshape(-1, 1)

    def loss(lin_r):
        link = jnp.fft.rfftn(lin_r)
        p, v = nbody_bf_lightcone(bg, link, pos, g_tgt, a0=0.0, a1=1.0,
                                  n_steps=3)
        mesh = paint(p, SHAPE, order=2)
        return (mesh**2).mean()

    g = jax.grad(loss)(jnp.fft.irfftn(lin))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_nbody_scan_driver(rng):
    cosmo, lin = make_linear_field(rng, amplitude=0.1)
    bg = Background.create(cosmo)
    pos = regular_pos(SHAPE)
    p, v = nbody_bf_scan(bg, lin, pos, a=1.0, n_steps=4)
    assert p.shape == (1, *pos.shape)
    assert np.all(np.isfinite(np.asarray(p)))


def test_tsit5_matches_fine_rk4(rng):
    """The adaptive Tsit5 integrator agrees with a fine fixed-step RK4 of the
    same FastPM-convention ODE, from the same 1LPT start."""
    from montecosmo_tpu.ops.pm import nbody_rk4, nbody_tsit5

    cosmo, lin = make_linear_field(rng, amplitude=1.0)
    bg = Background.create(cosmo)
    pos0 = regular_pos(SHAPE)

    sol_ad = jax.jit(lambda m: nbody_tsit5(bg, m, pos0, 0.1, 1.0, tol=1e-4))(lin)
    sol_rk = jax.jit(lambda m: nbody_rk4(bg, m, pos0, 0.1, 1.0, n_steps=64))(lin)

    pos_ad, vel_ad = np.asarray(sol_ad[0][-1]), np.asarray(sol_ad[1][-1])
    pos_rk, vel_rk = np.asarray(sol_rk[0][-1]), np.asarray(sol_rk[1][-1])
    # displacements are O(1) cells; absolute agreement well below a cell
    np.testing.assert_allclose(pos_ad, pos_rk, atol=2e-3)
    np.testing.assert_allclose(vel_ad, vel_rk, atol=2e-3)


def test_tsit5_snapshots_and_identity(rng):
    from montecosmo_tpu.ops.pm import nbody_tsit5

    cosmo, lin = make_linear_field(rng, amplitude=0.5)
    bg = Background.create(cosmo)
    pos0 = regular_pos(SHAPE)

    pos, vel = jax.jit(lambda m: nbody_tsit5(bg, m, pos0, 0.2, 1.0, tol=1e-3,
                                             snapshots=3))(lin)
    assert pos.shape[0] == vel.shape[0] == 3
    assert np.all(np.isfinite(np.asarray(pos)))
    # snapshots are causally ordered: displacement grows with the growth factor
    d0 = np.abs(np.asarray(pos[1] - pos[0])).mean()
    d1 = np.abs(np.asarray(pos[2] - pos[1])).mean()
    assert 0 < d0 and 0 < d1

    # a0 == a1 short-circuits to the (1,) LPT state
    pos_id, _ = nbody_tsit5(bg, lin, pos0, 0.5, 0.5)
    assert pos_id.shape[0] == 1


def test_tsit5_grad_flows(rng):
    """Reverse mode through the masked adaptive scan is finite."""
    from montecosmo_tpu.ops.pm import nbody_tsit5

    cosmo, lin = make_linear_field(rng, amplitude=0.5)
    bg = Background.create(cosmo)
    pos0 = regular_pos(SHAPE)

    def loss(m):
        pos, vel = nbody_tsit5(bg, m, pos0, 0.2, 1.0, tol=1e-2, max_steps=24)
        return jnp.sum(jnp.sin(pos[-1]))

    g = jax.jit(jax.grad(loss))(lin)
    assert np.all(np.isfinite(np.asarray(g.real))) and np.abs(np.asarray(g)).max() > 0
