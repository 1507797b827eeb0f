"""Multi-process launch: a real 2-process jax.distributed CPU cluster.

Each worker initializes the distributed runtime (gloo collectives), builds a
global ('chains', 'mesh') pod mesh spanning both processes, and round-trips
the pencil FFT plus a psum over the global mesh axis — the collectives cross
the process boundary.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

coord, pid = sys.argv[1], int(sys.argv[2])

from montecosmo_tpu.parallel import cluster

cluster.init_distributed(coordinator_address=coord, num_processes=2,
                         process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
print(cluster.process_summary(), flush=True)

mesh = cluster.pod_mesh(n_chains=2)  # 2 chains (one per process) x 2 mesh
assert mesh.devices.shape == (2, 2)
# chains axis spans processes: each chain row lives on one process
rows = [{d.process_index for d in row} for row in mesh.devices]
assert all(len(r) == 1 for r in rows), rows

# --- collective sanity: psum over the global 'mesh' axis inside shard_map
from functools import partial

from jax import numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

sub = jax.sharding.Mesh(mesh.devices.reshape(-1), ("mesh",))

@jax.jit
@partial(shard_map, mesh=sub, in_specs=P("mesh"), out_specs=P("mesh"))
def total(x):
    return jnp.broadcast_to(jax.lax.psum(jnp.sum(x), "mesh"), x.shape[:1])

n = 8
global_x = np.arange(n, dtype=np.float32)
sharding = NamedSharding(sub, P("mesh"))
x = jax.make_array_from_callback((n,), sharding,
                                 lambda idx: global_x[idx])
out = total(x)
expect = float(global_x.sum())
local_vals = [float(s.data[0]) for s in out.addressable_shards]
assert all(abs(v - expect) < 1e-5 for v in local_vals), (local_vals, expect)

# --- pencil FFT round trip across the process boundary
from montecosmo_tpu.parallel import pencil_irfftn, pencil_rfftn

shape = (8, 8, 8)
rng = np.random.default_rng(0)
vol = rng.standard_normal(shape).astype(np.float32)
spec = NamedSharding(sub, P("mesh"))
xg = jax.make_array_from_callback(shape, spec, lambda idx: vol[idx])

@jax.jit
def roundtrip_err(x):
    return jnp.abs(pencil_irfftn(pencil_rfftn(x, sub), sub) - x).max()

err = float(roundtrip_err(xg))
assert err < 1e-4, err
print(f"worker {pid}: pencil fft roundtrip err {err:.2e}", flush=True)
print(f"WORKER_{pid}_OK", flush=True)
"""


def test_two_process_cluster(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    # workers must NOT inherit the single-process test XLA flags
    env.pop("XLA_FLAGS", None)
    env.pop("MONTECOSMO_TEST_PLATFORM", None)

    procs = [subprocess.Popen([sys.executable, str(script), coord, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd=str(REPO))
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_{i}_OK" in out, out[-4000:]


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
