#!/bin/bash
# Consolidated round-5 CPU accuracy queue (replaces cpu_queue_r5.sh +
# cpu_queue_r5b.sh): ONE serial queue because the 1-core host thrashes
# under parallel jax evals while also feeding the TPU chain.  Value
# order, with the w4a8 measurement (VERDICT r3 #1) hedged on the FIRST
# chain artifact so it cannot miss the session even if chainB_t30 lands
# late:
#   1. w4a8 + w8a8 PTQ accuracy on the r5_chain slim artifact (60% params)
#   2. six-axis robustness table on the same artifact (incl. the new
#      smallobj / lowlight held-out axes)
#   3. same measurements on chainB_t30 (86% params) if/when it lands
set -u
cd /root/repo
mkdir -p outputs/logs

run_job() {
  local name="$1"; shift
  if [ -e "outputs/logs/${name}.done" ]; then
    echo "== ${name}: already done, skipping"; return 0
  fi
  echo "== ${name}: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/cpu_queue.log
  nice -n 10 "$@" > "outputs/logs/${name}.log" 2>&1
  local rc=$?
  echo "== ${name}: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/cpu_queue.log
  [ $rc -eq 0 ] && touch "outputs/logs/${name}.done"
  return 0
}

wait_for() {
  local t=0
  while [ ! -e "outputs/logs/$1.done" ]; do
    sleep 120; t=$((t + 120))
    [ "$t" -ge "$2" ] && return 1
  done
  return 0
}

quant_and_eval() {  # quant_and_eval <tag> <chain-dir> <bits>
  local tag="$1" chain="$2" bits="$3"
  run_job "${tag}_quant" timeout 3600 python tools/quantize_model.py --cpu \
    -c "$chain/pipe_slim_ckpt.msgpack" \
    --slim-spec "$chain/pipe_slim_spec.json" \
    --depth 0.33 --width 0.25 --synth --img-size 320 \
    --act-scales channel --bits "$bits" \
    -o "$chain/acc/w${bits}a8.msgpack"
  [ -e "outputs/logs/${tag}_quant.done" ] && \
  run_job "${tag}_eval" timeout 7200 python tools/eval_harness_ckpt.py --cpu \
    -c "$chain/acc/w${bits}a8.msgpack" \
    --slim-spec "$chain/pipe_slim_spec.json" \
    --depth 0.33 --width 0.25 --quant w8a8 \
    --data-dir /tmp/cocodet_synth_coco --img-size 320
}

# ---- 1. the hedge: quant accuracy on the first artifact ----------------
wait_for r5_chain 14400 || { echo "cpu_all: r5_chain never landed"; exit 1; }
quant_and_eval a_w4 outputs/r5_chain 4
quant_and_eval a_w8 outputs/r5_chain 8

# ---- 2. six-axis robustness on the same artifact -----------------------
run_job rob_r5_chain timeout 14400 python tools/eval_robustness.py --cpu \
  -c outputs/r5_chain/pipe_slim_ckpt.msgpack \
  --slim-spec outputs/r5_chain/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --img-size 320 \
  -o outputs/r5_chain/robustness6.json

# ---- 3. the quality point, when it lands --------------------------------
wait_for r5_chainB_t30 14400 || { echo "cpu_all: chainB_t30 never landed" \
  | tee -a outputs/logs/cpu_queue.log; exit 0; }
quant_and_eval b_w4 outputs/r5_chainB_t30 4
quant_and_eval b_w8 outputs/r5_chainB_t30 8
run_job rob_chainB_t30 timeout 14400 python tools/eval_robustness.py --cpu \
  -c outputs/r5_chainB_t30/pipe_slim_ckpt.msgpack \
  --slim-spec outputs/r5_chainB_t30/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --img-size 320 \
  -o outputs/r5_chainB_t30/robustness6.json

echo "== CPU QUEUE ALL COMPLETE $(date -u)" | tee -a outputs/logs/cpu_queue.log
