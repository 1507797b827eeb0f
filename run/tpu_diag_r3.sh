#!/bin/bash
# Round-3 afternoon diagnostics (run AFTER the measurement queue drains):
# per-stage PM profile, window grouping sweep, chains-vmap efficiency,
# steps-per-program A/B, full-model stage profile.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo || exit 1
LOG=/tmp/diag_r3.log

probe() {
  for _ in $(seq 1 30); do
    timeout 420 python - <<'EOF' >/dev/null 2>&1 && return 0
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
assert float(jax.jit(lambda a: (a * a).sum())(jnp.ones((64, 64)))) == 4096.0
EOF
    sleep 90
  done
  return 1
}

run_job() {
  local name=$1; shift
  echo "=== $name start $(date -u '+%F %T')" >>"$LOG"
  probe || { echo "=== $name ABORT: backend dead" >>"$LOG"; return 1; }
  "$@" >>"/tmp/diag_r3_$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u '+%F %T')" >>"$LOG"
}

# one profiled staged eval at 256^3 (init/step/loss/step-vjp/init-vjp split)
run_job pmprof256 timeout 3600 env MONTECOSMO_PM_PROFILE=1 python - <<'EOF'
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/montecosmo_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from montecosmo_tpu.utils.profiling import force_sync_dispatch
force_sync_dispatch()
from bench import build_pm_staged
fn, white = build_pm_staged(256, 10)
for i in range(2):
    loss, grad = fn(white)
    print("eval", i, "loss", float(loss), flush=True)
EOF

run_job winsweep192 timeout 5400 python run/bench_window_md12.py 192
run_job chainsvmap64 timeout 3600 python run/bench_chains_vmap.py 64
run_job pm256spp2 timeout 5400 env MONTECOSMO_PM_STEPS_PER_PROGRAM=2 \
  python bench.py pm 256 10
run_job stages128 timeout 5400 python run/profile_stages.py 128
echo "=== diag done $(date -u '+%F %T')" >>"$LOG"
