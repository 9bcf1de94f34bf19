#!/bin/bash
# Round-4 TPU measurement queue — serialized (the axon tunnel is single-
# client; NEVER run two jax processes against the TPU at once).  Each job
# logs to outputs/logs/<name>.log; the queue probes port 8093 between jobs
# and stops if the relay is down (ROADMAP.md "Environment incident").
#
# Reconstructed from ROADMAP.md round-4 priority 1 (the /tmp/tpu_master2.sh
# list lost to the /tmp wipe): chainB apples-to-apples, stem6 A/B,
# bench_train --loader b64, remat A/B, chain_mixed, robustness-on-TPU.
set -u
cd /root/repo
mkdir -p outputs/logs

probe() { timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; }

run_job() {
  local name="$1"; shift
  if [ -e "outputs/logs/${name}.done" ]; then
    echo "== ${name}: already done, skipping"; return 0
  fi
  if ! probe; then
    echo "== TUNNEL DOWN before ${name} — aborting queue" | tee -a outputs/logs/queue.log
    exit 3
  fi
  echo "== ${name}: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  "$@" > "outputs/logs/${name}.log" 2>&1
  local rc=$?
  echo "== ${name}: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  [ $rc -eq 0 ] && touch "outputs/logs/${name}.done"
  return 0
}

# 1. Regenerate the fixed-mosaic chain anchor (outputs/ was wiped with the
#    old artifacts): defaults now carry the gentle-surgery prune schedule
#    (40ch x4/epoch, 3 settling epochs) + the mosaic class-column fix.
run_job r4_chain timeout 10800 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --out outputs/r4_chain

# 2. chainB: same anchor, smaller per-event budget (24ch) targeting the
#    ~75%-param point for the apples-to-apples VERDICT comparison
#    (the 40ch default landed at 60.1% params on the fixed anchor).
run_job r4_chainB timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage prune --init-from outputs/r4_chain \
  --prune-set prune_channels 24 \
  --out outputs/r4_chainB

# 3. stem6 A/B @640/b128/K=1024 slim (Focus -> 6x6s2 conv stem rewrite).
run_job stem6_base timeout 3600 python tools/bench_breakdown.py --slim \
  --batches 128 --topk 1024 --mode full
run_job stem6_new timeout 3600 python tools/bench_breakdown.py --slim \
  --batches 128 --topk 1024 --mode full --stem6

# 4. End-to-end input path: device-mosaic loader at b64/640 (the single-
#    chip end-to-end training operating point).
run_job loader_b64 timeout 3600 python tools/bench_train.py -b 64 \
  --size 640 --loader /tmp/cocodet_synth_coco --pipeline device-mosaic

# 5. remat A/B at the b64 operating point (cost of the b128-enabling remat).
run_job remat_off timeout 3600 python tools/bench_train.py -b 64 --size 640
run_job remat_on  timeout 3600 python tools/bench_train.py -b 64 --size 640 --remat

# 6. chain_mixed: train ON the mixed variant (occlusion/crowding/texture in
#    the training set) — the measured fix for the hard robustness axes.
run_job r4_chain_mixed timeout 10800 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --synth-variant mixed \
  --out outputs/r4_chain_mixed

echo "== QUEUE COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
