#!/bin/bash
# Round-3 TPU measurement queue: serialized (never two TPU processes),
# probe-gated (the axon backend wedges UNAVAILABLE for up to ~30 min after
# device-program kills), campaign jobs retried (infer.py resumes from its
# file-based phase caches).
#
# Usage: bash run/tpu_queue_r3.sh [job ...]   (default: all jobs in order)
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo || exit 1
LOG=/tmp/queue_r3.log
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

job_pm256() { timeout 7200 python bench.py pm 256 10; }
job_pm128() { timeout 5400 python bench.py pm 128 10; }
job_nbody128() { timeout 7200 python bench.py 128 auto nbody; }
job_bench128() { timeout 5400 python bench.py 128; }
# monolithic value+grad: the staged path (default at >=192) holds stage-1
# vjp residuals + stage outputs live simultaneously and RESOURCE_EXHAUSTs
# the chip at 192^3 (measured, round 3); post-lazy-kernel-fix the monolithic
# program compiles fine and lets XLA schedule the whole liveness
job_bench192() { MONTECOSMO_STAGED_EVAL=0 timeout 7200 python bench.py 192; }
job_mclmc64() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 timeout 21600 \
    python run/infer.py --register "$REG" --evolution lpt \
    --lik-type quad_gauss --self-data --n-chains 4 --n-steps-field 1024 \
    --n-steps-full 2048 --n-runs 2 --n-samples 128 --thinning 32 \
    --expe ess64
}
# config-4 re-run with the MCLMC f32 energy-noise-floor fix (the first ess64
# campaign's full-warmup step size collapsed 5e-3 -> 4e-6 chasing a 1e-7/dim
# target below the f32 quantization of |logpdf| ~ 4.7e6; chains froze).
# Fresh expe name: must NOT resume the broken warmup caches.
job_mclmc64b() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 timeout 21600 \
    python run/infer.py --register "$REG" --evolution lpt \
    --lik-type quad_gauss --self-data --n-chains 4 --n-steps-field 1024 \
    --n-steps-full 2048 --n-runs 2 --n-samples 128 --thinning 32 \
    --expe ess64b
}
job_nuts64() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 MONTECOSMO_NUTS_MAX_DOUBLINGS=6 \
    timeout 21600 python run/infer.py --register "$REG" --evolution nbody \
    --sampler nuts --self-data --n-chains 2 --n-steps-full 200 \
    --n-runs 2 --n-samples 64 --thinning 2 --expe nuts64 \
    --obs $OBS3
}
# config-3 at 32^3 with the HOST-driven NUTS step (each <=8-leapfrog leaf
# chunk is its own device program — no single program can breach the
# ~30-60 s axon kill regardless of tree depth)
job_nuts32() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 MONTECOSMO_NUTS_MAX_DOUBLINGS=6 \
    MONTECOSMO_NUTS_EVALS_PER_PROGRAM=8 \
    timeout 21600 python run/infer.py \
    --register registered/register_synthetic_z1.000_b32_p0.h5 \
    --evolution nbody --sampler nuts --self-data --n-chains 2 \
    --n-steps-full 200 --n-runs 2 --n-samples 64 --thinning 2 \
    --expe nuts32 --obs $OBS3
}
# config-3 A/B at 32^3 with the round-3 dense-metric + Laplace-seed NUTS
# (the diag baseline run pinned every tree at the depth cap: 126 evals/step
# warmup, ~63 evals/step sampling for a 3-scalar block)
job_nuts32d() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 MONTECOSMO_NUTS_MAX_DOUBLINGS=6 \
    MONTECOSMO_NUTS_EVALS_PER_PROGRAM=8 \
    timeout 21600 python run/infer.py \
    --register registered/register_synthetic_z1.000_b32_p0.h5 \
    --evolution nbody --sampler nuts --self-data --n-chains 2 \
    --n-steps-full 200 --n-runs 2 --n-samples 64 --thinning 2 \
    --expe nuts32d --obs $OBS3
}
# reduced 64^3 N-body NUTS (host-chunked, ~2.4 s/eval): feasibility +
# ESS/hour at the VERDICT target scale; budgets trimmed to fit a round
job_nuts64host() {
  MONTECOSMO_MAX_STEPS_PER_CALL=32 MONTECOSMO_NUTS_MAX_DOUBLINGS=5 \
    MONTECOSMO_NUTS_EVALS_PER_PROGRAM=4 \
    timeout 21600 python run/infer.py --register "$REG" \
    --evolution nbody --sampler nuts --self-data --n-chains 2 \
    --n-steps-full 100 --n-runs 2 --n-samples 16 --thinning 2 \
    --expe nuts64h --obs $OBS3
}

run_job() {
  local name=$1 tries=$2
  for t in $(seq 1 "$tries"); do
    echo "=== $name try $t start $(date -u '+%F %T')" >>"$LOG"
    if ! probe; then
      echo "=== $name try $t ABORT: backend dead" >>"$LOG"
      continue
    fi
    "job_$name" >>"/tmp/queue_r3_$name.log" 2>&1
    local rc=$?
    echo "=== $name try $t rc=$rc end $(date -u '+%F %T')" >>"$LOG"
    [ "$rc" -eq 0 ] && return 0
    sleep 120
  done
  return 1
}

JOBS=${*:-"pm256 nbody128 mclmc64 nuts64 bench192"}
for j in $JOBS; do
  case $j in
    pm256|pm128|nbody128|bench128|bench192) run_job "$j" 2 ;;
    mclmc64|mclmc64b|nuts64|nuts32|nuts32d|nuts64host) run_job "$j" 3 ;;
    *) echo "unknown job $j" >>"$LOG" ;;
  esac
done
echo "=== queue done $(date -u '+%F %T')" >>"$LOG"
