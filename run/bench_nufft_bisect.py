"""Why did nufft measure 183 ms in the stage profile but 0.04 ms standalone?

Same jitted nufft, same shapes — inputs produced three ways:
  A. synthetic (jit make())
  B. the profile's pipeline outputs (f_lpt / f_lb), profile's (wrong) units
  C. pipeline outputs converted to init units (the model's actual convention)

Run: PYTHONPATH=/root/repo:/root/.axon_site python run/bench_nufft_bisect.py
"""
import time

import numpy as np
import jax
from jax import numpy as jnp, random as jr

jax.config.update("jax_compilation_cache_dir", "/tmp/montecosmo_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from montecosmo_tpu import FieldLevelModel, default_config
from montecosmo_tpu.models.bricks import lagrangian_bias, regular_pos, white2lin
from montecosmo_tpu.ops.background import Background
from montecosmo_tpu.ops.hermitian import chreshape, r2chshape, rg2cgh
from montecosmo_tpu.ops.paint import nufft
from montecosmo_tpu.ops.pm import lpt


def timeit(fn, *args, n=10, vary=True):
    if vary:
        @jax.jit
        def _perturb(args, eps):
            return tuple(x + eps for x in args)
        variants = [jax.block_until_ready(_perturb(args, jnp.float32(i * 1e-6)))
                    for i in range(n)]
    else:
        variants = [args] * n
    out = fn(*variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*variants[i])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main(final=64):
    conf = dict(default_config)
    conf.update(final_shape=3 * (final,), cell_length=500.0 * 2 / final,
                evolution="lpt", lpt_order=2, a_obs=0.5, curved_sky=False,
                box_center=(0.0, 0.0, 1500.0), lik_type="quad_gauss",
                precond="kaiser")
    m = FieldLevelModel(**conf)
    bg = Background.create(m.cosmo_fid)
    P = int(np.prod(m.ptcl_shape))

    f_nufft = jax.jit(lambda p, w: nufft(
        p, m.init_shape, tuple(m.paint_shape), weights=w, paint_order=2,
        interlace_order=2))

    # A: synthetic
    @jax.jit
    def make():
        lattice = regular_pos(m.init_shape, m.ptcl_shape)
        disp = jnp.clip(jr.normal(jr.key(0), (P, 3)) * 0.6, -4, 4)
        w = jr.uniform(jr.key(1), (P,)) + 0.5
        return lattice + disp, w

    posA, wA = make()
    print(f"A synthetic, vary    : {timeit(f_nufft, posA, wA):8.2f} ms",
          flush=True)
    print(f"A synthetic, novary  : "
          f"{timeit(f_nufft, posA, wA, vary=False):8.2f} ms", flush=True)

    # B: pipeline outputs (evol units, as in the buggy profile)
    norm = np.prod(np.divide(m.init_shape, m.box_size)) ** 0.5
    f_lin = jax.jit(lambda w: chreshape(
        white2lin(m.cosmo_fid, rg2cgh(w) * norm, m.init_shape, m.box_size,
                  m.lin_kpow), r2chshape(m.evol_shape)))
    init_mesh = f_lin(jr.normal(jr.key(0), m.init_shape))
    pos0 = jax.jit(lambda: regular_pos(m.evol_shape, m.ptcl_shape))()
    bias = {k: jnp.float32(v) for k, v in
            dict(b1=1.0, b2=0.1, bs2=0.1, b3=0.0, bds2=0.0, bs3=0.0,
                 bn2=0.0, bnpar=0.0).items()}
    png = {k: jnp.float32(0.0) for k in
           ("fNL_bp", "fNL_bpd", "fNL_bpd2", "fNL_bps2", "fNL_bn2p")}
    f_lb = jax.jit(lambda im, b: lagrangian_bias(
        m.cosmo_fid, pos0, jnp.float32(0.6), m.box_size, im, b, png,
        kpow=m.lin_kpow, read_order=1, bg=bg, sites_shape=m.evol_sites)[0])
    f_lpt = jax.jit(lambda im: lpt(bg, im, pos=pos0, a=jnp.float32(0.6),
                                   lpt_order=2, read_order=1,
                                   sites_shape=m.evol_sites))
    dpos, _ = f_lpt(init_mesh)
    posB = jax.jit(lambda a, b: a + b)(pos0, dpos)
    wB = f_lb(init_mesh, bias)
    print(f"B pipeline evol-units: {timeit(f_nufft, posB, wB):8.2f} ms",
          flush=True)

    # C: converted to init units (model convention)
    posC = jax.jit(lambda p: p * jnp.float32(
        m.init_shape[0] / m.evol_shape[0]))(posB)
    print(f"C pipeline init-units: {timeit(f_nufft, posC, wB):8.2f} ms",
          flush=True)
    print(f"C novary             : "
          f"{timeit(f_nufft, posC, wB, vary=False):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
