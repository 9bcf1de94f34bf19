#!/bin/bash
# Session-7 CPU accuracy queue: score the chainB_t30 artifact (the
# quality point with the doubled recovery tune) as soon as the TPU
# queue lands it — bf16 robustness + w8a8 + the measured w4a8 recipe
# (clip search + keep-frac 0.4).  Serial + nice'd: the 1-core host is
# also feeding the TPU chain.
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

CHAIN=outputs/r5_chainB_t30
wait_for r5_chainB_t30 12600 || { echo "cpu_s7: chainB_t30 never landed" \
  | tee -a outputs/logs/cpu_queue.log; exit 1; }

run_job bt30_w8_quant timeout 3600 python tools/quantize_model.py --cpu \
  -c "$CHAIN/pipe_slim_ckpt.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 --synth --img-size 320 \
  --act-scales channel --bits 8 \
  -o "$CHAIN/acc/w8a8.msgpack"
[ -e outputs/logs/bt30_w8_quant.done ] && \
run_job bt30_w8_eval timeout 7200 python tools/eval_harness_ckpt.py --cpu \
  -c "$CHAIN/acc/w8a8.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 --quant w8a8 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320

# the measured w4a8 deployment recipe (README: clip search defaults ON
# for --bits 4; worst-MSE 40% of convs stay int8)
run_job bt30_w4_quant timeout 3600 python tools/quantize_model.py --cpu \
  -c "$CHAIN/pipe_slim_ckpt.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 --synth --img-size 320 \
  --act-scales channel --bits 4 --w4-keep-frac 0.4 \
  -o "$CHAIN/acc/w4a8_mixed40.msgpack"
[ -e outputs/logs/bt30_w4_quant.done ] && \
run_job bt30_w4_eval timeout 7200 python tools/eval_harness_ckpt.py --cpu \
  -c "$CHAIN/acc/w4a8_mixed40.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 --quant w8a8 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320

run_job rob_bt30 timeout 14400 python tools/eval_robustness.py --cpu \
  -c "$CHAIN/pipe_slim_ckpt.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 --img-size 320 \
  -o "$CHAIN/robustness6.json"

echo "== CPU QUEUE S7 COMPLETE $(date -u)" | tee -a outputs/logs/cpu_queue.log
