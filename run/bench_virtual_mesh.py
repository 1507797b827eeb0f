"""Virtual-mesh scaling of the sharded PRODUCTION model (BASELINE config 5).

Times FieldLevelModel.logpdf+grad under parallel.context.mesh_context on an
n-device virtual CPU mesh (xla_force_host_platform_device_count).  CPU
collectives are shared-memory copies, so absolute numbers say nothing about
a pod — what this measures is that the decomposed program COMPILES, runs,
and does not drown in collective/partition overhead as the mesh grows
(per-device FLOPs shrink ~1/n; wall time should not grow).

Run: python run/bench_virtual_mesh.py [final=32] [n_iter=3]
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from jax import random as jr
from jax.sharding import Mesh

from montecosmo_tpu import FieldLevelModel, default_config
from montecosmo_tpu.parallel.context import mesh_context


def main(final=32, n_iter=3):
    conf = dict(default_config)
    conf.update(final_shape=3 * (final,), cell_length=1000.0 / final,
                evolution="lpt", a_obs=0.5, curved_sky=False,
                box_center=(0.0, 0.0, 1500.0), lik_type="quad_gauss",
                precond="kaiser", init_oversamp=1.0, evol_oversamp=1.5,
                ptcl_oversamp=1.5, paint_oversamp=1.5)
    model = FieldLevelModel(**conf)
    params = model.reparam(dict(model.fiduc), inv=True)
    params["white_mesh_"] = jr.normal(jr.key(0), model.init_shape)
    pred = model.predict(seed=1, samples=params, hide_base=False,
                         hide_det=False, hide_samp=False)
    params["count_mesh"] = pred["count_mesh"]

    vag = jax.jit(jax.value_and_grad(model.logpdf))

    def timed():
        v, g = vag(params)
        jax.block_until_ready((v, g))
        t0 = time.perf_counter()
        for _ in range(n_iter):
            v, g = vag(params)
        jax.block_until_ready((v, g))
        return (time.perf_counter() - t0) / n_iter, float(v)

    results = {}
    base_dt, base_v = timed()
    results[1] = base_dt
    print(f"# 1 device : {base_dt*1e3:8.1f} ms  logpdf={base_v:.3f}")

    for n in (2, 4, 8):
        devs = np.asarray(jax.devices()[:n])
        with mesh_context(Mesh(devs, ("mesh",))):
            dt, v = timed()
        results[n] = dt
        assert np.isclose(v, base_v, rtol=2e-4, atol=5e-3 + 2e-6 * abs(base_v))
        print(f"# {n} devices: {dt*1e3:8.1f} ms  (x{base_dt/dt:.2f} vs 1-dev)"
              f"  logpdf={v:.3f}")

    print(json.dumps({
        "metric": f"virtual-mesh sharded logpdf+grad wall at {final}^3 "
                  "(CPU, collective-overhead check, not pod perf)",
        "value": {str(k): round(v * 1e3, 1) for k, v in results.items()},
        "unit": "ms",
        "vs_baseline": None}))


if __name__ == "__main__":
    main(final=int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         n_iter=int(sys.argv[2]) if len(sys.argv) > 2 else 3)
