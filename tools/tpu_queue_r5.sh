#!/bin/bash
# Round-5 TPU queue — regenerate the chain artifacts (outputs/ is wiped
# between sessions) and land the two open accuracy frontiers:
#   1. chainB_t30: doubled recovery tune at the QUALITY point (24ch ->
#      86.3% params).  chainC_t30 showed the cliff is partly tune-budget-
#      limited (+1.5 AP50 from 15 -> 30 tune epochs at 80.4% params);
#      chainB's 15-epoch tune saturated at 0.8827 vs dense 0.8961 — if
#      the same dose-response holds, this closes most of the last gap.
#   2. w4a8 accuracy: int4-weight PTQ (tools/quantize_model.py --bits 4)
#      on the chainB slim artifact vs the w8a8 per-channel production
#      recipe vs bf16 — the datapoint the round-4 capability work needs.
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

# 0. Driver bench gate first — the one hard deliverable.
run_job bench_gate timeout 1500 python bench.py

# 1. Regenerate the fixed-mosaic anchor (deterministic: reproduces the
#    r4_chain trajectory bit-for-bit — phase2 0.8961/0.6555).
run_job r5_chain timeout 10800 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --out outputs/r5_chain

# 2. chainB: the quality point (prune stage only; reproduces 0.8827).
run_job r5_chainB timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage prune --init-from outputs/r5_chain \
  --prune-set prune_channels 24 \
  --out outputs/r5_chainB

# 3. chainB_t30: doubled recovery tune from chainB's prune ckpt.
run_job r5_chainB_t30 timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage tune --init-from outputs/r5_chainB \
  --tune-set max_epoch 30 \
  --out outputs/r5_chainB_t30

# 4. w4a8 vs w8a8 vs bf16 accuracy on the chainB_t30 slim artifact
#    (CPU-forced evals; can also run via acc_queue_r4.sh for the int8
#    pair).  The w4a8 ckpt is nibble-packed — load_checkpoint unpacks.
run_job w4a8_quant python tools/quantize_model.py --cpu \
  -c outputs/r5_chainB_t30/pipe_slim_ckpt.msgpack \
  --slim-spec outputs/r5_chainB_t30/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --synth --img-size 320 \
  --act-scales channel --bits 4 \
  -o outputs/r5_chainB_t30/acc/w4a8.msgpack
run_job w4a8_eval python tools/eval_harness_ckpt.py --cpu \
  -c outputs/r5_chainB_t30/acc/w4a8.msgpack \
  --slim-spec outputs/r5_chainB_t30/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --quant w8a8 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320

echo "== QUEUE R5 COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
