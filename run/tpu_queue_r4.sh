#!/bin/bash
# Round-4 TPU measurement queue: serialized (never two TPU processes),
# probe-gated (the axon backend wedges UNAVAILABLE for up to ~30 min after
# device-program kills), campaign jobs retried (infer.py resumes from its
# file-based phase caches).
#
# Round-4 priorities (VERDICT r3 "Next round" 1/4/5):
#   1. mclmc64 — config-4 MCLMC ESS/hour at 64^3 (the metric itself; results
#      were lost with /tmp between rounds so the campaign restarts, with the
#      f32 recentring + dKE + noise-floor fixes in place).
#   2. nuts32d — config-3 NUTS at 32^3, HOST-DRIVEN transition + dense
#      metric + Laplace-seeded mass: hardware validation of the chunked
#      transition (per-program dispatch tax) + ESS/hour.
#   3. profile128/profile256 — MONTECOSMO_PM_PROFILE per-stage breakdown
#      for the roofline accounting (BENCH_NOTES "roofline" section).
#   4. nuts64host — stretch: reduced 64^3 N-body NUTS feasibility.
#
# Usage: bash run/tpu_queue_r4.sh [job ...]   (default: priority order)
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo || exit 1
LOG=/tmp/queue_r4.log
REG=registered/register_synthetic_z1.000_b64_p0.h5
OBS3="count_mesh white_mesh b2 bs2 b3 bds2 bs3 bn2 bnpar fNL fNL_bp fNL_bpd \
fNL_bpd2 fNL_bps2 fNL_bn2p alpha_iso alpha_ap ngbars s_e s_k2e s_kmu2e \
s_ed s_e2 s_ep"

probe() {
  for _ in $(seq 1 40); do
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

job_mclmc64() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 timeout 21600 \
    python run/infer.py --register "$REG" --evolution lpt \
    --lik-type quad_gauss --self-data --n-chains 4 --n-steps-field 1024 \
    --n-steps-full 2048 --n-runs 2 --n-samples 128 --thinning 32 \
    --expe ess64r4 \
  && python run/ess_report.py results/*ess64r4* | tee results/ess64r4_report.txt
}
job_nuts32d() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 MONTECOSMO_NUTS_MAX_DOUBLINGS=6 \
    MONTECOSMO_NUTS_EVALS_PER_PROGRAM=8 \
    timeout 14400 python run/infer.py \
    --register registered/register_synthetic_z1.000_b32_p0.h5 \
    --evolution nbody --sampler nuts --self-data --n-chains 2 \
    --n-steps-full 200 --n-runs 2 --n-samples 64 --thinning 2 \
    --expe nuts32r4 --obs $OBS3 \
  && python run/ess_report.py results/*nuts32r4* | tee results/nuts32r4_report.txt
}
job_profile128() {
  MONTECOSMO_PM_PROFILE=1 timeout 3600 python bench.py pm 128 10
}
job_profile256() {
  MONTECOSMO_PM_PROFILE=1 timeout 7200 python bench.py pm 256 10
}
job_nuts64host() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 MONTECOSMO_NUTS_MAX_DOUBLINGS=5 \
    MONTECOSMO_NUTS_EVALS_PER_PROGRAM=4 \
    timeout 14400 python run/infer.py --register "$REG" \
    --evolution nbody --sampler nuts --self-data --n-chains 2 \
    --n-steps-full 100 --n-runs 2 --n-samples 16 --thinning 2 \
    --expe nuts64r4 --obs $OBS3 \
  && python run/ess_report.py results/*nuts64r4* | tee results/nuts64r4_report.txt
}

run_job() {
  local name=$1 tries=$2
  for t in $(seq 1 "$tries"); do
    echo "=== $name try $t start $(date -u '+%F %T')" >>"$LOG"
    if ! probe; then
      echo "=== $name try $t ABORT: backend dead" >>"$LOG"
      continue
    fi
    "job_$name" >>"/tmp/queue_r4_$name.log" 2>&1
    local rc=$?
    echo "=== $name try $t rc=$rc end $(date -u '+%F %T')" >>"$LOG"
    [ "$rc" -eq 0 ] && return 0
    sleep 120
  done
  return 1
}

JOBS=${*:-"mclmc64 nuts32d profile128 nuts64host"}
for j in $JOBS; do
  case $j in
    profile128|profile256) run_job "$j" 2 ;;
    mclmc64|nuts32d|nuts64host) run_job "$j" 3 ;;
    *) echo "unknown job $j" >>"$LOG" ;;
  esac
done
echo "=== queue done $(date -u '+%F %T')" >>"$LOG"
