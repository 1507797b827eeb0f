"""Bisect which eager/model-construction step degrades subsequent dispatches.

Run: PYTHONPATH=/root/repo:/root/.axon_site python run/bench_degrade.py
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
    init, shape, P = (96, 96, 96), (112, 112, 112), 112 ** 3

    @jax.jit
    def make(key):
        lattice = jnp.stack(
            jnp.meshgrid(*[jnp.arange(112, dtype=jnp.float32) * (96 / 112)] * 3,
                         indexing="ij"), -1).reshape(-1, 3)
        k1, k2 = jr.split(key)
        return lattice + jnp.clip(jr.normal(k1, (P, 3)) * 0.6, -4, 4), \
            jr.uniform(k2, (P,)) + 0.5

    f = jax.jit(lambda p, w: nufft(p, init, shape, weights=w, paint_order=2,
                                   interlace_order=2))
    ins = [jax.block_until_ready(make(jr.key(i))) for i in range(3)]
    jax.block_until_ready(f(*ins[0]))

    def sample(tag):
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*ins[i]))
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"{tag:34s}: " + " ".join(f"{t:7.2f}" for t in ts) + " ms",
              flush=True)

    sample("baseline")

    # step 1: a pile of small EAGER ops (tunnel dispatches)
    x = jnp.ones(8)
    for _ in range(50):
        x = x + 1.0
    jax.block_until_ready(x)
    sample("after 50 eager ops")

    # step 2: Background tables
    from montecosmo_tpu.ops.background import Background, get_cosmology
    cosmo = get_cosmology(Omega_m=0.3111, sigma8=0.8102)
    bg = Background.create(cosmo)
    jax.block_until_ready(bg.a_tab)
    sample("after Background.create")

    # step 3: eager table lookups
    a = bg.g2a(bg.a2g(jnp.float32(0.5)))
    jax.block_until_ready(a)
    sample("after eager a2g/g2a")

    # step 4: los_scalefactor_mesh (the fiducial geometry)
    from montecosmo_tpu.models.bricks import los_scalefactor_mesh
    from jax.scipy.spatial.transform import Rotation
    rot = Rotation.from_rotvec(jnp.zeros(3))
    _, am = los_scalefactor_mesh(np.array([0.0, 0.0, 1500.0]), rot,
                                 np.array([1000.0] * 3), (64,) * 3, bg,
                                 0.5, False)
    jax.block_until_ready(am)
    sample("after los_scalefactor_mesh")

    # step 5: the full model
    from montecosmo_tpu import FieldLevelModel, default_config
    conf = dict(default_config)
    conf.update(final_shape=3 * (64,), cell_length=500.0 * 2 / 64,
                evolution="lpt", lpt_order=2, a_obs=0.5, curved_sky=False,
                box_center=(0.0, 0.0, 1500.0), lik_type="quad_gauss",
                precond="kaiser")
    m = FieldLevelModel(**conf)
    sample("after FieldLevelModel")


if __name__ == "__main__":
    main()
