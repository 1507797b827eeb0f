#!/bin/bash
# Round-4 *right-sized* TPU queue. The r4 queue's full-size campaigns
# (4.5 h at 64^3) cannot complete inside a round; these jobs are scoped to
# ~20-30 min each so a completed run (and therefore an ESS/hour number)
# actually lands on disk. Serialized + probe-gated as before.
#
#   1. mclmc64 — config-4 MCLMC ESS/hour at 64^3 (2 chains, 2x32 kept
#      samples, thinning 16): the metric itself, two rounds overdue.
#   2. nuts32d — config-3 host-driven NUTS at 32^3 (dense metric): hardware
#      validation of the chunked transition + ESS/hour.
#
# Usage: bash run/tpu_queue_r4b.sh [job ...]
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo || exit 1
LOG=/tmp/queue_r4b.log
REG=registered/register_synthetic_z1.000_b64_p0.h5
OBS3="count_mesh white_mesh b2 bs2 b3 bds2 bs3 bn2 bnpar fNL fNL_bp fNL_bpd \
fNL_bpd2 fNL_bps2 fNL_bn2p alpha_iso alpha_ap ngbars s_e s_k2e s_kmu2e \
s_ed s_e2 s_ep"

probe() {
  for _ in $(seq 1 10); do
    timeout 420 python - <<'EOF' >/dev/null 2>&1 && return 0
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
assert float(jax.jit(lambda a: (a * a).sum())(jnp.ones((64, 64)))) == 4096.0
EOF
    sleep 60
  done
  return 1
}

job_mclmc64() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 timeout 2700 \
    python run/infer.py --register "$REG" --evolution lpt \
    --lik-type quad_gauss --self-data --n-chains 2 --n-steps-field 256 \
    --n-steps-full 512 --n-runs 2 --n-samples 32 --thinning 16 \
    --expe ess64r4 \
  && python run/ess_report.py results/*ess64r4* | tee results/ess64r4_report.txt
}
job_nuts32d() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 MONTECOSMO_NUTS_MAX_DOUBLINGS=6 \
    MONTECOSMO_NUTS_EVALS_PER_PROGRAM=8 \
    timeout 2700 python run/infer.py \
    --register registered/register_synthetic_z1.000_b32_p0.h5 \
    --evolution nbody --sampler nuts --self-data --n-chains 2 \
    --n-steps-full 128 --n-runs 1 --n-samples 64 --thinning 2 \
    --expe nuts32r4 --obs $OBS3 \
  && python run/ess_report.py results/*nuts32r4* | tee results/nuts32r4_report.txt
}

run_job() {
  local name=$1 tries=$2
  declare -f "job_$name" >/dev/null || {
    echo "=== unknown job $name — skipped" >>"$LOG"; return 1; }
  for t in $(seq 1 "$tries"); do
    echo "=== $name try $t start $(date -u '+%F %T')" >>"$LOG"
    if ! probe; then
      echo "=== $name try $t ABORT: backend dead" >>"$LOG"
      continue
    fi
    "job_$name" >>"/tmp/queue_r4b_$name.log" 2>&1
    local rc=$?
    echo "=== $name try $t rc=$rc end $(date -u '+%F %T')" >>"$LOG"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  return 1
}

JOBS=${*:-"mclmc64 nuts32d"}
for j in $JOBS; do
  run_job "$j" 2
done
echo "=== queue done $(date -u '+%F %T')" >>"$LOG"
