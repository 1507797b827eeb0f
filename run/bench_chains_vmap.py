"""Single-eval vs vmapped-chains value+grad throughput at the campaign
operating point (64^3 final, LPT, quad-Gauss — bench.py config at 64).

The config-4 MCLMC campaign runs ~38 s per 32-step 4-chain warmup chunk
(0.30 s per chain-step) while the single-eval bench runs 85 ms/eval — a
~3.5x gap.  This separates the candidate causes: vmap-batching efficiency
of the render (this script) vs sampler/adaptation overhead + per-chunk
host pacing (the rest).

Run: PYTHONPATH=/root/repo:/root/.axon_site python run/bench_chains_vmap.py [final=64]
"""
import sys
import time

import numpy as np
import jax
from jax import numpy as jnp, random as jr, vmap

jax.config.update("jax_compilation_cache_dir", "/tmp/montecosmo_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from bench import build  # noqa: E402  (repo root on PYTHONPATH)
from montecosmo_tpu.utils.profiling import force_sync_dispatch  # noqa: E402


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main(final=64):
    force_sync_dispatch()
    step, params = build(final)
    t1 = timeit(step, params)
    print(f"single eval: {t1:8.1f} ms", flush=True)

    for n_chains in (2, 4):
        batched = jax.jit(vmap(step.__wrapped__ if hasattr(step, "__wrapped__")
                               else step))
        keys = jr.split(jr.key(1), n_chains)
        bparams = {k: (jnp.broadcast_to(v, (n_chains,) + jnp.shape(v))
                       if k != "white_mesh_" else
                       vmap(lambda s: jr.normal(s, jnp.shape(v)))(keys))
                   for k, v in params.items()}
        tn = timeit(batched, bparams)
        print(f"vmap x{n_chains}:   {tn:8.1f} ms  "
              f"({tn / (n_chains * t1):.2f}x of {n_chains} serial evals)",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
