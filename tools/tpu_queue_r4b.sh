#!/bin/bash
# Round-4 TPU queue, stage 2: inference-graph A/Bs added this session.
# Run AFTER tools/tpu_queue_r4.sh (same serialization rules — single TPU
# client, probe 8093 between jobs, one program per process where possible).
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

# split-concat FPN graph A/B at the headline operating point (w8a8 int8,
# 640/b128/K=1024 slim).  Baseline w8a8 number comes from bench.py's
# validated 2575.5; measure the split variant (one program per process).
run_job int8_split timeout 3600 python tools/bench_int8.py --only w8a8 --split-cat

# per-channel activation scales: same graph shape (vector divide + folded
# kernel) — confirm throughput-neutral before making it the accuracy recipe.
run_job int8_perchan timeout 3600 python tools/bench_int8.py --only w8a8 --act-scales channel

# bf16 slim split A/B (r2-comparable metric family)
run_job bf16_split timeout 3600 python tools/bench_int8.py --only bf16 --split-cat

# split_cat + stem6 combined (bf16 slim full graph — bench_breakdown has no
# int8 path; compare against the stem6_base/stem6_new jobs of queue r4)
run_job bf16_split_stem6 timeout 3600 python tools/bench_breakdown.py --slim \
  --batches 128 --topk 1024 --mode full --stem6 --split-cat

# chainC: bracket the ~75%-param point between chainB (24ch -> 86.3%
# params, AP50 0.8827) and the 40ch default (-> 60.1% params, 0.7900) —
# same fixed-mosaic anchor, 32ch per event.
run_job r4_chainC timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage prune --init-from outputs/r4_chain \
  --prune-set prune_channels 32 \
  --out outputs/r4_chainC

# int8 batch sweep: the b128 optimum was measured on the bf16 slim model
# (bench.py docstring); the int8 graph has different tiling pressure.
run_job int8_b192 timeout 3600 python tools/bench_int8.py --only w8a8 -b 192
run_job int8_b256 timeout 3600 python tools/bench_int8.py --only w8a8 -b 256

echo "== QUEUE R4B COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
