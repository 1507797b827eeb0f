"""Nail the axon-tunnel timing semantics: per-call wall times for the SAME
jitted nufft under (a) distinct random inputs, (b) identical input reused,
(c) block-per-call vs block-at-end.

Run: PYTHONPATH=/root/repo:/root/.axon_site python run/bench_semantics.py
"""
import time

import numpy as np
import jax
from jax import numpy as jnp, random as jr

jax.config.update("jax_compilation_cache_dir", "/tmp/montecosmo_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from montecosmo_tpu.ops.paint import nufft


def main():
    init = (96, 96, 96)
    shape = (112, 112, 112)
    P = 112 ** 3

    @jax.jit
    def make(key):
        lattice = jnp.stack(
            jnp.meshgrid(*[jnp.arange(112, dtype=jnp.float32) * (96 / 112)] * 3,
                         indexing="ij"), -1).reshape(-1, 3)
        k1, k2 = jr.split(key)
        disp = jnp.clip(jr.normal(k1, (P, 3)) * 0.6, -4, 4)
        w = jr.uniform(k2, (P,)) + 0.5
        return lattice + disp, w

    f = jax.jit(lambda p, w: nufft(p, init, shape, weights=w, paint_order=2,
                                   interlace_order=2))

    ins = [jax.block_until_ready(make(jr.key(i))) for i in range(8)]
    jax.block_until_ready(f(*ins[0]))  # compile

    print("distinct inputs, block per call:", flush=True)
    for i in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*ins[i]))
        print(f"  call {i}: {(time.perf_counter() - t0) * 1e3:8.2f} ms",
              flush=True)

    print("same input, block per call:", flush=True)
    for i in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*ins[0]))
        print(f"  call {i}: {(time.perf_counter() - t0) * 1e3:8.2f} ms",
              flush=True)

    print("distinct inputs, block at end:", flush=True)
    t0 = time.perf_counter()
    outs = [f(*ins[i]) for i in range(8)]
    jax.block_until_ready(outs[-1])
    print(f"  total/8: {(time.perf_counter() - t0) / 8 * 1e3:8.2f} ms",
          flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(outs)
    print(f"  block ALL extra: {(time.perf_counter() - t0) * 1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()


def main2():
    """Does FieldLevelModel construction slow subsequent executions?"""
    init = (96, 96, 96)
    shape = (112, 112, 112)
    P = 112 ** 3

    @jax.jit
    def make(key):
        lattice = jnp.stack(
            jnp.meshgrid(*[jnp.arange(112, dtype=jnp.float32) * (96 / 112)] * 3,
                         indexing="ij"), -1).reshape(-1, 3)
        k1, k2 = jr.split(key)
        disp = jnp.clip(jr.normal(k1, (P, 3)) * 0.6, -4, 4)
        w = jr.uniform(k2, (P,)) + 0.5
        return lattice + disp, w

    f = jax.jit(lambda p, w: nufft(p, init, shape, weights=w, paint_order=2,
                                   interlace_order=2))
    ins = [jax.block_until_ready(make(jr.key(i))) for i in range(4)]
    jax.block_until_ready(f(*ins[0]))

    def sample(tag):
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*ins[i]))
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"{tag}: " + " ".join(f"{t:7.2f}" for t in ts) + " ms", flush=True)

    sample("before model")

    from montecosmo_tpu import FieldLevelModel, default_config
    conf = dict(default_config)
    conf.update(final_shape=3 * (64,), cell_length=500.0 * 2 / 64,
                evolution="lpt", lpt_order=2, a_obs=0.5, curved_sky=False,
                box_center=(0.0, 0.0, 1500.0), lik_type="quad_gauss",
                precond="kaiser")
    m = FieldLevelModel(**conf)
    sample("after model ")


if __name__ == "__main__":
    import sys
    main2() if len(sys.argv) > 1 else main()
