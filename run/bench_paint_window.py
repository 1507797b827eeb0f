"""TPU microbench: paint_window vs ops.paint at production sizes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python run/bench_paint_window.py
"""
import sys
import time

import numpy as np
import jax
from jax import numpy as jnp, random as jr

jax.config.update("jax_platforms", "axon")
jax.config.update("jax_compilation_cache_dir", "/tmp/montecosmo_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from montecosmo_tpu.ops.paint import paint
from montecosmo_tpu.ops.paint_window import paint_window


from montecosmo_tpu.utils.profiling import force_sync_dispatch

force_sync_dispatch()


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main(n=112):
    shape = lat = (n, n, n)
    P = n ** 3

    @jax.jit
    def make():
        lattice = jnp.stack(
            jnp.meshgrid(*[jnp.arange(n, dtype=jnp.float32)] * 3,
                         indexing="ij"), -1).reshape(-1, 3)
        disp = jnp.clip(jr.normal(jr.key(0), (P, 3)) * 1.5, -5, 5)
        w = jr.uniform(jr.key(1), (P,)) + 0.5
        return lattice + disp, w

    pos, w = make()
    probe = jax.jit(lambda: jr.normal(jr.key(2), shape))()

    ref_fn = jax.jit(lambda p, w: paint(p % float(n), shape, w, 2))
    t_ref = timeit(ref_fn, pos, w)
    print(f"XLA scatter paint: {t_ref:8.2f} ms", flush=True)

    ref_g = jax.jit(jax.grad(
        lambda p, w: jnp.vdot(paint(p % float(n), shape, w, 2), probe),
        (0, 1)))
    t_refg = timeit(ref_g, pos, w)
    print(f"XLA scatter grad : {t_refg:8.2f} ms", flush=True)

    base = None
    for H in (8,):
        for g in ((4, 4, None), (8, 8, None)):
            for bs in (8,):
                tag = f"H={H} g={g} bs={bs}"
                try:
                    fn = jax.jit(lambda p, w, H=H, g=g, bs=bs: paint_window(
                        p, shape, lat, w, 2, max_disp=H, group=g,
                        batch_size=bs))
                    t = timeit(fn, pos, w)
                    if base is None:
                        err = float(jnp.abs(fn(pos, w) - ref_fn(pos, w)).max())
                        base = err
                        print(f"   (max abs err vs scatter: {err:.2e})",
                              flush=True)
                    print(f"window {tag:28s}: {t:8.2f} ms "
                          f"({t_ref / t:4.1f}x)", flush=True)
                except Exception as e:
                    print(f"window {tag:28s}: FAILED {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)

    # gradient with the best-looking config
    for H, g, bs in ((8, (4, 4, None), None), (8, (8, 8, None), None)):
        gfn = jax.jit(jax.grad(
            lambda p, w: jnp.vdot(paint_window(p, shape, lat, w, 2,
                                               max_disp=H, group=g,
                                               batch_size=bs), probe),
            (0, 1)))
        t = timeit(gfn, pos, w)
        print(f"window grad H={H} g={g}: {t:8.2f} ms ({t_refg / t:4.1f}x)",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 112)
