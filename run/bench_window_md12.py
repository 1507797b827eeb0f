"""Window paint/read grouping sweep at the 256^3 pure-PM geometry (md=12).

The default group (8, 8, 64) was tuned at md=5-8 (64-128^3 production
configs, BENCH_NOTES round 1).  At md=12 the per-particle window volume
(Gx+2m)(Gy+2m)(Gz+2m) grows ~4x, and the optimal group may shrink.  This
sweeps groups/batch at the north-star operating point: one paint + one
3-channel read, forward and value+grad.

Run: PYTHONPATH=/root/repo:/root/.axon_site python run/bench_window_md12.py [mesh=192]
(192^3 by default: same md regime as 256^3 but ~3x faster to sweep.)
"""
import sys
import time

import numpy as np
import jax
from jax import numpy as jnp, random as jr

jax.config.update("jax_compilation_cache_dir", "/tmp/montecosmo_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from montecosmo_tpu.ops.paint_window import paint_window, read_window
from montecosmo_tpu.utils.profiling import force_sync_dispatch

MESH = int(sys.argv[1]) if len(sys.argv) > 1 else 192
MD = int(np.ceil(45.0 / (1000.0 / 256)))  # = 12, the 256^3 pm displacement bound
SHAPE = 3 * (MESH,)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    force_sync_dispatch()
    key = jr.key(0)
    # lattice-ordered positions displaced ~N(0, md/3), clipped by the op
    lat = jnp.stack(jnp.meshgrid(*(jnp.arange(s, dtype=jnp.float32)
                                   for s in SHAPE), indexing="ij"), -1)
    pos = (lat + (MD / 3.0) * jr.normal(key, lat.shape)).reshape(-1, 3)
    pos = jax.jit(lambda p: p)(pos)  # materialize once
    meshes = jr.normal(jr.key(1), SHAPE + (3,))

    def paint_fn(group, batch):
        return jax.jit(lambda p: paint_window(
            p, SHAPE, SHAPE, 1.0, 2, max_disp=MD, group=group,
            batch_size=batch, clip=True))

    def read_fn(group, batch):
        return jax.jit(lambda p, m: read_window(
            p, m, SHAPE, 2, max_disp=MD, group=group, batch_size=batch,
            clip=True))

    groups = [(8, 8, 64), (8, 8, 16), (8, 8, 8), (4, 4, 16), (4, 4, 64),
              (16, 16, 16), (8, 8, 32)]
    for g in groups:
        for batch in (8,):
            try:
                tp = timeit(paint_fn(g, batch), pos)
                tpg = timeit(jax.jit(jax.grad(lambda q, _g=g: jnp.sum(
                    paint_window(q, SHAPE, SHAPE, 1.0, 2, max_disp=MD,
                                 group=_g, batch_size=batch,
                                 clip=True) ** 2))), pos)
                tr = timeit(read_fn(g, batch), pos, meshes)
                trg = timeit(jax.jit(jax.grad(lambda q, m, _g=g: jnp.sum(
                    read_window(q, m, SHAPE, 2, max_disp=MD, group=_g,
                                batch_size=batch, clip=True) ** 2),
                    argnums=(0, 1))), pos, meshes)
                print(f"g={g} b={batch}: paint {tp:8.1f} ms  "
                      f"paint+vjp {tpg:8.1f}  read {tr:8.1f}  "
                      f"read+vjp {trg:8.1f}", flush=True)
            except Exception as e:  # noqa: BLE001 — sweep survives one bad config
                print(f"g={g} b={batch}: FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
