"""Pod-scale forward render: the fully X-sharded white->linear->Zel'dovich->
paint pipeline equals the single-device render."""
import numpy as np
import pytest
import jax
from jax import numpy as jnp, random as jr
from jax.sharding import Mesh

from montecosmo_tpu.ops.background import Background, Planck18
from montecosmo_tpu.ops.fourier import gradient_hat, invlaplace_hat, rfftk
from montecosmo_tpu.ops.paint import paint
from montecosmo_tpu.ops.power import lin_power_interp
from montecosmo_tpu.parallel.render import sharded_zeldovich_density

SHAPE = (32, 16, 16)
BOX = np.array([400.0, 200.0, 200.0])


def reference_density(white, bg, pow_fn, a, lpt_order=1):
    """Single-device version of the same pipeline."""
    k = jnp.fft.rfftn(white)
    kvec = rfftk(SHAPE, BOX)
    kmesh = sum(ki**2 for ki in kvec) ** 0.5
    cell_per_box = np.prod(np.divide(SHAPE, BOX))
    lin = k * (pow_fn(kmesh) * cell_per_box) ** 0.5

    pot = lin * invlaplace_hat(kvec)
    cell = np.divide(BOX, SHAPE)
    grads = [jnp.fft.irfftn(-gradient_hat(kvec, i) * pot) / cell[i]
             for i in range(3)]
    disp = float(bg.a2g(a)) * jnp.stack(grads, -1)

    if lpt_order == 2:
        delta2 = 0.0
        diag_sum = 0.0
        for i in range(3):
            h_ii = jnp.fft.irfftn(gradient_hat(kvec, i) ** 2 * pot)
            delta2 += h_ii * diag_sum
            diag_sum += h_ii
            for j in range(i + 1, 3):
                h_ij = gradient_hat(kvec, i) * gradient_hat(kvec, j)
                delta2 -= jnp.fft.irfftn(h_ij * pot) ** 2
        pot2 = jnp.fft.rfftn(delta2) * invlaplace_hat(kvec)
        grads2 = [jnp.fft.irfftn(-gradient_hat(kvec, i) * pot2) / cell[i]
                  for i in range(3)]
        disp -= float(bg.a2g2(a)) * jnp.stack(grads2, -1)

    lattice = jnp.stack(jnp.meshgrid(*[jnp.arange(float(s)) for s in SHAPE],
                                     indexing="ij"), -1)
    pos = (lattice + disp).reshape(-1, 3)
    return paint(pos, SHAPE, order=2)


def test_sharded_render_matches_single_device(rng):
    assert len(jax.devices()) == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))

    cosmo = Planck18()
    bg = Background.create(cosmo)
    pow_fn = lin_power_interp(cosmo)
    a = 0.5

    white = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    got = sharded_zeldovich_density(white, bg, BOX, a, mesh, pow_fn, halo=4)
    expect = reference_density(white, bg, pow_fn, a)

    np.testing.assert_allclose(float(got.sum()), float(np.prod(SHAPE)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-3, atol=2e-3)
    # it is a real density field with structure
    assert float(got.std()) > 0.05


def test_sharded_render_2lpt_matches_single_device(rng):
    assert len(jax.devices()) == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))

    cosmo = Planck18()
    bg = Background.create(cosmo)
    pow_fn = lin_power_interp(cosmo)
    a = 0.5

    white = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    got = sharded_zeldovich_density(white, bg, BOX, a, mesh, pow_fn, halo=4,
                                    lpt_order=2)
    expect = reference_density(white, bg, pow_fn, a, lpt_order=2)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-3, atol=2e-3)
    # 2LPT displacement actually differs from Zel'dovich
    zel = reference_density(white, bg, pow_fn, a, lpt_order=1)
    assert float(jnp.abs(got - zel).max()) > 1e-3


def test_sharded_lpt_observable_matches_bricks(rng):
    """The decomposed biased+RSD observable equals the single-device pipeline
    built from the real `models.bricks.lagrangian_bias` brick (operators read
    at the lattice nodes) plus the flat-sky RSD shift."""
    from montecosmo_tpu.models.bricks import lagrangian_bias
    from montecosmo_tpu.parallel.render import sharded_lpt_observable

    assert len(jax.devices()) == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))

    cosmo = Planck18()
    bg = Background.create(cosmo)
    pow_fn = lin_power_interp(cosmo)
    a = 0.5
    bias = dict(b1=1.0, b2=0.5, bs2=0.3, b3=0.2, bds2=0.1, bs3=0.05, bn2=0.1,
                bnpar=0.5)

    white = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    got = sharded_lpt_observable(white, bg, BOX, a, mesh, pow_fn, bias=bias,
                                 rsd=True, halo=4, lpt_order=1)

    # ---- single-device reference through the production bias brick
    lin = jnp.fft.rfftn(white)
    kvec = rfftk(SHAPE, BOX)
    kmesh = sum(ki**2 for ki in kvec) ** 0.5
    cell_per_box = np.prod(np.divide(SHAPE, BOX))
    lin = lin * (pow_fn(kmesh) * cell_per_box) ** 0.5

    png = dict(fNL_bp=0.0, fNL_bpd=0.0, fNL_bpd2=0.0, fNL_bps2=0.0,
               fNL_bn2p=0.0)
    lattice = jnp.stack(jnp.meshgrid(*[jnp.arange(float(s)) for s in SHAPE],
                                     indexing="ij"), -1).reshape(-1, 3)
    weights, dvel, _ = lagrangian_bias(cosmo, lattice, a, BOX, lin, bias,
                                       png, read_order=2, bg=bg)

    pot = lin * invlaplace_hat(kvec)
    cell = np.divide(BOX, SHAPE)
    grads = [jnp.fft.irfftn(-gradient_hat(kvec, i) * pot) / cell[i]
             for i in range(3)]
    g, f = float(bg.a2g(a)), float(bg.a2f(a))
    disp = g * jnp.stack(grads, -1).reshape(-1, 3)
    # flat-sky RSD incl. velocity bias: dvel is physical (h/Mpc) -> cell
    disp = disp.at[:, 2].add(g * f * grads[2].reshape(-1)
                             + dvel[:, 2] / cell[2])
    expect = paint(lattice + disp, SHAPE, weights=weights, order=2)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-3, atol=5e-3)
    # the bias weights actually bite (not the unit-weight render)
    assert float(jnp.abs(weights - 1.0).max()) > 0.1


def test_sharded_png_observable_matches_bricks(rng):
    """PNG on the decomposed layout: local fNL applied to the linear field
    (add_png) plus the primordial-potential bias operators equal the
    single-device bricks pipeline."""
    from montecosmo_tpu.models.bricks import add_png, lagrangian_bias
    from montecosmo_tpu.parallel.render import sharded_lpt_observable

    assert len(jax.devices()) == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))

    cosmo = Planck18()
    bg = Background.create(cosmo)
    pow_fn = lin_power_interp(cosmo)
    a = 0.5
    fNL = 50.0
    bias = dict(b1=1.0, b2=0.5)
    png = dict(fNL_bp=2.0, fNL_bpd=1.0, fNL_bpd2=0.5, fNL_bps2=0.3,
               fNL_bn2p=0.2)

    white = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    got = sharded_lpt_observable(white, bg, BOX, a, mesh, pow_fn, bias=bias,
                                 rsd=False, png=png, fNL=fNL, halo=4)

    # ---- single-device reference: add_png then lagrangian_bias(png branch)
    lin = jnp.fft.rfftn(white)
    kvec = rfftk(SHAPE, BOX)
    kmesh = sum(ki**2 for ki in kvec) ** 0.5
    cell_per_box = np.prod(np.divide(SHAPE, BOX))
    lin = lin * (pow_fn(kmesh) * cell_per_box) ** 0.5
    lin = add_png(cosmo, fNL, lin, BOX, bg=bg)

    full_bias = dict(bias, bs2=0.0, b3=0.0, bds2=0.0, bs3=0.0, bn2=0.0,
                     bnpar=0.0)
    lattice = jnp.stack(jnp.meshgrid(*[jnp.arange(float(s)) for s in SHAPE],
                                     indexing="ij"), -1).reshape(-1, 3)
    weights, _, _ = lagrangian_bias(cosmo, lattice, a, BOX, lin, full_bias,
                                    png, png_type="local", read_order=2,
                                    bg=bg)
    pot = lin * invlaplace_hat(kvec)
    cell = np.divide(BOX, SHAPE)
    grads = [jnp.fft.irfftn(-gradient_hat(kvec, i) * pot) / cell[i]
             for i in range(3)]
    disp = float(bg.a2g(a)) * jnp.stack(grads, -1).reshape(-1, 3)
    expect = paint(lattice + disp, SHAPE, weights=weights, order=2)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-3, atol=5e-3)
    # PNG actually changes the field vs the png-less render
    plain = sharded_lpt_observable(white, bg, BOX, a, mesh, pow_fn, bias=bias,
                                   rsd=False, halo=4)
    assert float(jnp.abs(got - plain).max()) > 1e-3


def test_sharded_field_logpdf_value_and_grad_match(rng):
    """The fully decomposed field-level log-posterior AND its gradient w.r.t.
    the sharded white-noise latent equal the single-device pipeline — grads
    flow through halo exchanges, pencil all_to_alls, and pmean."""
    from montecosmo_tpu.models.bricks import lagrangian_bias
    from montecosmo_tpu.parallel.render import sharded_field_logpdf

    assert len(jax.devices()) == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))

    cosmo = Planck18()
    bg = Background.create(cosmo)
    pow_fn = lin_power_interp(cosmo)
    a = 0.5
    bias = dict(b1=1.0, b2=0.3)
    noise_std = 0.7

    white = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    obs = jnp.asarray(1.0 + 0.1 * rng.standard_normal(SHAPE), jnp.float32)

    def ref_logp(w):
        lin = jnp.fft.rfftn(w)
        kvec = rfftk(SHAPE, BOX)
        kmesh = sum(ki**2 for ki in kvec) ** 0.5
        cell_per_box = np.prod(np.divide(SHAPE, BOX))
        lin = lin * (pow_fn(kmesh) * cell_per_box) ** 0.5

        full_bias = dict(bias, bs2=0.0, b3=0.0, bds2=0.0, bs3=0.0, bn2=0.0,
                         bnpar=0.0)
        png = dict(fNL_bp=0.0, fNL_bpd=0.0, fNL_bpd2=0.0, fNL_bps2=0.0,
                   fNL_bn2p=0.0)
        lattice = jnp.stack(
            jnp.meshgrid(*[jnp.arange(float(s)) for s in SHAPE],
                         indexing="ij"), -1).reshape(-1, 3)
        weights, _, _ = lagrangian_bias(cosmo, lattice, a, BOX, lin,
                                        full_bias, png, read_order=2, bg=bg)
        pot = lin * invlaplace_hat(kvec)
        cell = np.divide(BOX, SHAPE)
        grads = [jnp.fft.irfftn(-gradient_hat(kvec, i) * pot) / cell[i]
                 for i in range(3)]
        g, f = bg.a2g(a), bg.a2f(a)
        disp = g * jnp.stack(grads, -1).reshape(-1, 3)
        disp = disp.at[:, 2].add(g * f * grads[2].reshape(-1))
        dens = paint(lattice + disp, SHAPE, weights=weights, order=2)
        return (-0.5 * jnp.sum(w**2)
                - 0.5 * jnp.sum((dens - obs) ** 2) / noise_std**2)

    def shard_logp(w):
        return sharded_field_logpdf(w, obs, bg, BOX, a, mesh, pow_fn,
                                    bias=bias, rsd=True, noise_std=noise_std,
                                    halo=4)

    from jax.sharding import NamedSharding, PartitionSpec as P

    v_ref, g_ref = jax.value_and_grad(ref_logp)(white)
    white_sh = jax.device_put(white, NamedSharding(mesh, P("mesh", None, None)))
    v_got, g_got = jax.jit(jax.value_and_grad(shard_logp))(white_sh)

    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    g_ref, g_got = np.asarray(g_ref), np.asarray(g_got)
    scale = np.abs(g_ref).max()
    assert scale > 0
    np.testing.assert_allclose(g_got, g_ref, rtol=1e-3, atol=2e-3 * scale)


def test_mclmc_over_sharded_potential(rng):
    """Pod-scale inference: MCLMC steps with the white-noise latent X-sharded
    over the device mesh and the decomposed logpdf as the potential — states
    stay finite and the position keeps its spatial sharding."""
    from jax import random as jr
    from jax.sharding import NamedSharding, PartitionSpec as P

    from montecosmo_tpu.parallel.render import sharded_field_logpdf
    from montecosmo_tpu.samplers import get_mclmc_run, mclmc_init
    from montecosmo_tpu.samplers.mclmc import MCLMCAdaptationState

    assert len(jax.devices()) == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))
    cosmo = Planck18()
    bg = Background.create(cosmo)
    pow_fn = lin_power_interp(cosmo)

    obs = jnp.asarray(1.0 + 0.1 * rng.standard_normal(SHAPE), jnp.float32)
    obs = jax.device_put(obs, NamedSharding(mesh, P("mesh", None, None)))

    def logdf(params):
        return sharded_field_logpdf(params["white_"], obs, bg, BOX, 0.5, mesh,
                                    pow_fn, bias=dict(b1=1.0), rsd=True,
                                    noise_std=1.0, halo=4)

    white = jax.device_put(
        jnp.asarray(rng.standard_normal(SHAPE), jnp.float32),
        NamedSharding(mesh, P("mesh", None, None)))

    state = mclmc_init({"white_": white}, logdf, jr.key(0))
    d = int(np.prod(SHAPE))
    config = MCLMCAdaptationState(L=jnp.sqrt(float(d)), step_size=0.05,
                                  inverse_mass_matrix=1.0)
    state, samples = get_mclmc_run(logdf, n_samples=4, thinning=1)(
        jr.key(1), state, config)

    assert np.all(np.isfinite(np.asarray(samples["logdensity"])))
    # the chain position is still spatially sharded over the device mesh
    assert len(state.position["white_"].sharding.device_set) == 8


def test_sharded_bullfrog_matches_single_device(rng):
    """n decomposed BullFrog DKD steps == the single-device `bullfrog_step`
    scan, for particles that stay within the halo of their owning slab."""
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from montecosmo_tpu.ops.pm import bullfrog_step
    from montecosmo_tpu.parallel.render import sharded_bullfrog_steps

    assert len(jax.devices()) == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))
    bg = Background.create(Planck18())

    # slab-ordered lattice particles (leading axis shardable by ownership)
    # with small perturbations: drifts stay well inside halo=3 < slab width 4
    lattice = jnp.stack(jnp.meshgrid(*[jnp.arange(float(s)) for s in SHAPE],
                                     indexing="ij"), -1).reshape(-1, 3)
    pos = lattice + 0.3 * jnp.asarray(rng.standard_normal(lattice.shape),
                                      jnp.float32)
    vel = 0.5 * jnp.asarray(rng.standard_normal(lattice.shape), jnp.float32)

    g0, g1, n_steps = 0.3, 0.5, 2
    dg = (g1 - g0) / n_steps
    gs = g0 + dg * jnp.arange(n_steps)
    body = bullfrog_step(bg, dg, SHAPE, paint_order=2)
    (pos_ref, vel_ref), _ = lax.scan(body, (pos, vel), gs)

    spec = NamedSharding(mesh, P("mesh"))
    got_pos, got_vel = sharded_bullfrog_steps(
        jax.device_put(pos, spec), jax.device_put(vel, spec), bg,
        g0, g1, n_steps, SHAPE, mesh, halo=3)

    np.testing.assert_allclose(np.asarray(got_pos), np.asarray(pos_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_vel), np.asarray(vel_ref),
                               rtol=1e-4, atol=1e-4)


def test_sharded_bullfrog_resort_matches_single_device(rng):
    """With resort=True, particles may cross slab boundaries: the neighbor
    exchange re-owns them and the final painted density still equals the
    single-device scan."""
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from montecosmo_tpu.ops.pm import bullfrog_step
    from montecosmo_tpu.parallel.halo import halo_paint
    from montecosmo_tpu.parallel.render import sharded_bullfrog_steps

    assert len(jax.devices()) == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("mesh",))
    bg = Background.create(Planck18())

    lattice = jnp.stack(jnp.meshgrid(*[jnp.arange(float(s)) for s in SHAPE],
                                     indexing="ij"), -1).reshape(-1, 3)
    pos = lattice + 0.3 * jnp.asarray(rng.standard_normal(lattice.shape),
                                      jnp.float32)
    # velocities large enough that edge particles cross slab boundaries
    vel = 4.0 * jnp.asarray(rng.standard_normal(lattice.shape), jnp.float32)

    g0, g1, n_steps = 0.3, 0.6, 3
    dg = (g1 - g0) / n_steps
    gs = g0 + dg * jnp.arange(n_steps)
    body = bullfrog_step(bg, dg, SHAPE, paint_order=2)
    (pos_ref, _), _ = lax.scan(body, (pos, vel), gs)
    expect = paint(pos_ref, SHAPE, order=2)

    spec = NamedSharding(mesh, P("mesh"))
    got_pos, got_vel, valid = sharded_bullfrog_steps(
        jax.device_put(pos, spec), jax.device_put(vel, spec), bg,
        g0, g1, n_steps, SHAPE, mesh, halo=3, resort=True)

    # nothing was dropped (mass conserved across all exchanges)
    assert int(valid.sum()) == lattice.shape[0]
    # every valid particle lives in the slab of the shard that owns it —
    # i.e. boundary-crossers really were handed to their new owner
    cap = got_pos.shape[0] // 8
    owner = (np.floor(np.asarray(got_pos)[:, 0]).astype(int) % SHAPE[0]) // (SHAPE[0] // 8)
    shard = np.repeat(np.arange(8), cap)
    ok = ~np.asarray(valid) | (owner == shard)
    assert ok.all()
    # and migration actually happened: net per-slab counts changed
    n_end = np.bincount(owner[np.asarray(valid)], minlength=8)
    assert np.any(n_end != lattice.shape[0] // 8), n_end
    got = halo_paint(got_pos, SHAPE, mesh, weights=valid.astype(jnp.float32),
                     order=2, halo=3)
    np.testing.assert_allclose(float(got.sum()), lattice.shape[0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-3, atol=5e-3)
