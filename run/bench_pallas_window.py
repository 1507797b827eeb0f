"""TPU bench: Pallas window paint vs the XLA window path (value + grad).

Run: PYTHONPATH=/root/repo:/root/.axon_site python run/bench_pallas_window.py
"""
import time

import numpy as np
import jax
from jax import lax, numpy as jnp, random as jr

jax.config.update("jax_compilation_cache_dir", "/tmp/montecosmo_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from montecosmo_tpu.ops.paint_window import paint_window
from montecosmo_tpu.ops.paint_window_pallas import paint_window_pallas
from montecosmo_tpu.utils.profiling import force_sync_dispatch

force_sync_dispatch()


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    shape = lat = (112, 112, 112)
    P = 112 ** 3

    @jax.jit
    def make():
        lattice = jnp.stack(
            jnp.meshgrid(*[jnp.arange(112, dtype=jnp.float32)] * 3,
                         indexing="ij"), -1).reshape(-1, 3)
        disp = jnp.clip(jr.normal(jr.key(0), (P, 3)) * 0.7, -4.5, 4.5)
        w = jr.uniform(jr.key(1), (P,)) + 0.5
        return lattice + disp, w

    pos, w = make()
    probe = jax.jit(lambda: jr.normal(jr.key(2), shape))()

    xla_f = jax.jit(lambda p, w: paint_window(p, shape, lat, w, 2, max_disp=5,
                                              clip=True))
    xla_g = jax.jit(jax.value_and_grad(
        lambda p, w: jnp.vdot(xla_f(p, w), probe), (0, 1)))
    print(f"XLA window fwd : {timeit(xla_f, pos, w):8.2f} ms", flush=True)
    print(f"XLA window v+g : {timeit(xla_g, pos, w):8.2f} ms", flush=True)

    ref = xla_f(pos, w)
    for g, wxc in (((8, 8, None), 6), ((8, 8, None), 4), ((4, 4, None), 8),
                   ((8, 8, 56), 6)):
        tag = f"g={g} wxc={wxc}"
        try:
            pf = jax.jit(lambda p, w, g=g, wxc=wxc: paint_window_pallas(
                p, shape, lat, w, 2, max_disp=5, group=g, wx_chunk=wxc,
                clip=True))
            err = float(jnp.abs(pf(pos, w) - ref).max())
            t = timeit(pf, pos, w)
            print(f"pallas fwd {tag:22s}: {t:8.2f} ms (err {err:.1e})",
                  flush=True)
            pg = jax.jit(jax.value_and_grad(
                lambda p, w, g=g, wxc=wxc: jnp.vdot(paint_window_pallas(
                    p, shape, lat, w, 2, max_disp=5, group=g, wx_chunk=wxc,
                    clip=True), probe), (0, 1)))
            t = timeit(pg, pos, w)
            print(f"pallas v+g {tag:22s}: {t:8.2f} ms", flush=True)
        except Exception as e:
            print(f"pallas {tag:26s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
