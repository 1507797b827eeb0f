#!/bin/bash
# Round-5 TPU queue. Changes vs r4b (VERDICT r4 next#1b):
#   * every job runs under `flock /tmp/montecosmo_tpu.lock` — bench.py
#     waits on the same lock, so the driver's bench can never collide with
#     a queue job;
#   * a HARD DEADLINE (QUEUE_DEADLINE_EPOCH, default: now + 5h30): no job
#     starts past it, and each job's timeout bounds the overrun — the queue
#     is guaranteed dead well before the round-end bench window;
#   * unknown job names are skipped instead of burning a probe (ADVICE r4).
#
# Jobs:
#   bench128  — the driver headline: python bench.py 128 (also warms the
#               /tmp persistent compile + obs caches the driver reuses)
#   benchpm   — north-star PM microbench at 256^3
#   nuts32    — config-3 host-driven NUTS at 32^3 (re-run with eigh fix)
#   profile256— stage-level attribution of the 256^3 staged value+grad
#
# Usage: bash run/tpu_queue_r5.sh [job ...]
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo || exit 1
LOG=/tmp/queue_r5.log
LOCK=/tmp/montecosmo_tpu.lock
REG=registered/register_synthetic_z1.000_b64_p0.h5
DEADLINE=${QUEUE_DEADLINE_EPOCH:-$(( $(date +%s) + 19800 ))}
# exported: job functions run in a `bash -c` child (export -f), where an
# unexported var expands EMPTY — an empty --obs made the r5 nuts32 campaign
# infer everything including the observation itself
export OBS3="count_mesh white_mesh b2 bs2 b3 bds2 bs3 bn2 bnpar fNL fNL_bp \
fNL_bpd fNL_bpd2 fNL_bps2 fNL_bn2p alpha_iso alpha_ap ngbars s_e s_k2e \
s_kmu2e s_ed s_e2 s_ep"
export REG

probe() {
  # under the lock too: even a 20 ms probe op must not poke the chip while
  # another process (e.g. the driver's bench) is mid-run
  for _ in $(seq 1 10); do
    flock "$LOCK" timeout 420 python - <<'EOF' >/dev/null 2>&1 && return 0
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
assert float(jax.jit(lambda a: (a * a).sum())(jnp.ones((64, 64)))) == 4096.0
EOF
    sleep 60
  done
  return 1
}

job_bench128() {
  timeout 3600 python bench.py 128
}
job_benchpm() {
  timeout 3600 python bench.py pm 256
}
job_nuts32() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 MONTECOSMO_NUTS_MAX_DOUBLINGS=6 \
    MONTECOSMO_NUTS_EVALS_PER_PROGRAM=8 \
    timeout 2700 python run/infer.py \
    --register registered/register_synthetic_z1.000_b32_p0.h5 \
    --evolution nbody --sampler nuts --self-data --n-chains 2 \
    --n-steps-full 128 --n-runs 1 --n-samples 64 --thinning 2 \
    --expe nuts32r5 --obs $OBS3 \
  && python run/ess_report.py results/*nuts32r5* | tee results/nuts32r5_report.txt
}
job_profile256() {
  # VERDICT r4 next#3: attribute the 55.8 s/eval of the NORTH-STAR PM
  # microbench (bench.py pm 256, staged BullFrog) — MONTECOSMO_PM_PROFILE
  # prints per-stage wall times inside build_pm_staged. (profile_stages.py
  # profiles the FULL model and its stage-5 build RESOURCE_EXHAUSTs at
  # 256^3 single-chip.)
  MONTECOSMO_PM_PROFILE=1 timeout 3600 python bench.py pm 256
}
job_profile256spp() {
  # same, with 5 BullFrog steps per device program (fewer, larger programs)
  MONTECOSMO_PM_PROFILE=1 MONTECOSMO_PM_STEPS_PER_PROGRAM=5 \
    timeout 3600 python bench.py pm 256
}

run_job() {
  local name=$1 tries=$2
  declare -f "job_$name" >/dev/null || {
    echo "=== unknown job $name — skipped" >>"$LOG"; return 1; }
  for t in $(seq 1 "$tries"); do
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "=== $name try $t SKIP: past deadline $(date -u '+%F %T')" >>"$LOG"
      return 1
    fi
    echo "=== $name try $t start $(date -u '+%F %T')" >>"$LOG"
    if ! probe; then
      echo "=== $name try $t ABORT: backend dead" >>"$LOG"
      continue
    fi
    # MONTECOSMO_TPU_LOCK_HELD: bench.py self-locks the same file; tell it
    # the ancestor already holds it (else it waits out its 900 s timeout)
    MONTECOSMO_TPU_LOCK_HELD=1 flock "$LOCK" bash -c "job_$name" \
      >>"/tmp/queue_r5_$name.log" 2>&1
    local rc=$?
    echo "=== $name try $t rc=$rc end $(date -u '+%F %T')" >>"$LOG"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}
export -f job_bench128 job_benchpm job_nuts32 job_profile256 job_profile256spp 2>/dev/null

JOBS=${*:-"bench128 nuts32 profile256"}
for j in $JOBS; do
  run_job "$j" 2
done
echo "=== queue done $(date -u '+%F %T')" >>"$LOG"
