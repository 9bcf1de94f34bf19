#!/bin/bash
# Round-5 TPU queue — regenerate the chain artifacts (outputs/ is wiped
# between sessions) and land the open accuracy frontiers, in value order
# (an early abort still harvests the top items):
#   1. chainB_t30: doubled recovery tune at the QUALITY point (24ch ->
#      86.3% params).  chainC_t30 showed the cliff is partly tune-budget-
#      limited (+1.5 AP50 from 15 -> 30 tune epochs at 80.4% params);
#      chainB's 15-epoch tune saturated at 0.8827 vs dense 0.8961 — if
#      the same dose-response holds, this closes most of the last gap.
#   2. w4a8 vs w8a8 vs bf16 accuracy on the chainB_t30 slim artifact —
#      the datapoint the round-4 capability work needs (VERDICT #1).
#   3. Recovery-budget sweep across the frontier (VERDICT #2): tune
#      epochs 15/30/60 and distill coefficient at the 80.4%-param
#      (chainC 32ch) and 60.1%-param (40ch default) points.
# Same serialization rules as r4 queues: single TPU client, probe 8093
# between jobs.
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

# require NAME: skip the next job unless NAME finished ok (prevents a
# doomed downstream run after an upstream failure).
require() { [ -e "outputs/logs/$1.done" ]; }

# 0. Driver bench gate first — the one hard deliverable.
run_job bench_gate timeout 1500 python bench.py

# 1. Regenerate the fixed-mosaic anchor (deterministic: reproduces the
#    r4_chain trajectory bit-for-bit — phase2 0.8961/0.6555).
run_job r5_chain timeout 10800 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --out outputs/r5_chain

# 2. chainB: the quality point (prune stage only; reproduces 0.8827).
require r5_chain && \
run_job r5_chainB timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage prune --init-from outputs/r5_chain \
  --prune-set prune_channels 24 \
  --out outputs/r5_chainB

# 3. chainB_t30: doubled recovery tune from chainB's prune ckpt.
require r5_chainB && \
run_job r5_chainB_t30 timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage tune --init-from outputs/r5_chainB \
  --tune-set max_epoch 30 \
  --out outputs/r5_chainB_t30

# 4. w4a8 / w8a8 accuracy: moved to tools/cpu_queue_all.sh (CPU-forced
#    jobs must not serialize into the single-client TPU queue; the CPU
#    queue runs them in parallel, hedged on the first chain artifact).

# 5. Frontier recovery-budget sweep (VERDICT #2).  chainC = the
#    80.4%-param point (32ch/event); t15 scored 0.8128, t30 0.8281 —
#    t60 + distill-coef probe ask whether longer recovery closes to
#    within ~3 AP50 of dense (0.8961).
require r5_chain && \
run_job r5_chainC timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage prune --init-from outputs/r5_chain \
  --prune-set prune_channels 32 \
  --out outputs/r5_chainC

require r5_chainC && \
run_job r5_chainC_t60 timeout 10800 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage tune --init-from outputs/r5_chainC \
  --tune-set max_epoch 60 \
  --out outputs/r5_chainC_t60

# 6. The 60.1%-param point (40ch default): does the dose-response hold
#    at the deep-compression end (t15 = 0.7900)?
require r5_chain && \
run_job r5_chain40_t30 timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage tune --init-from outputs/r5_chain \
  --tune-set max_epoch 30 \
  --out outputs/r5_chain40_t30

# 7. Distill-coefficient probe at the 80.4% point: same 30-epoch budget
#    as chainC_t30 (0.8281) but coef 2.0 — separates "more gradient
#    steps" from "stronger teacher pull".
require r5_chainC && \
run_job r5_chainC_t30d2 timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage tune --init-from outputs/r5_chainC \
  --tune-set max_epoch 30 distill_coefficient 2.0 \
  --out outputs/r5_chainC_t30d2

# 8. Deep end, doubled again.
require r5_chain && \
run_job r5_chain40_t60 timeout 10800 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage tune --init-from outputs/r5_chain \
  --tune-set max_epoch 60 \
  --out outputs/r5_chain40_t60

echo "== QUEUE R5 COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
