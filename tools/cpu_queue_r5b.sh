#!/bin/bash
# Round-5 CPU accuracy queue, stage B — the w4a8 / w8a8 accuracy
# measurements on the chainB_t30 slim artifact (VERDICT r3 #1), moved OUT
# of tpu_queue_r5.sh: they are CPU-forced jobs that were serialized into
# the single-client TPU queue, costing ~2h of scarce tunnel time.  The
# TPU queue skips them via pre-created .done markers and proceeds
# straight to the frontier sweep; this script runs the real evals in
# parallel (nice'd — the 1-core host also feeds the TPU jobs).
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

wait_for() {  # wait_for <done-marker> <max-seconds>
  local t=0
  while [ ! -e "outputs/logs/$1.done" ]; do
    sleep 120; t=$((t + 120))
    [ "$t" -ge "$2" ] && return 1
  done
  return 0
}

wait_for r5_chainB_t30 21600 || { echo "cpu_r5b: chainB_t30 never landed"; exit 1; }

CHAIN=outputs/r5_chainB_t30

run_job cpu_w4a8_quant timeout 3600 python tools/quantize_model.py --cpu \
  -c "$CHAIN/pipe_slim_ckpt.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 --synth --img-size 320 \
  --act-scales channel --bits 4 \
  -o "$CHAIN/acc/w4a8.msgpack"

[ -e outputs/logs/cpu_w4a8_quant.done ] && \
run_job cpu_w4a8_eval timeout 7200 python tools/eval_harness_ckpt.py --cpu \
  -c "$CHAIN/acc/w4a8.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 --quant w8a8 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320

run_job cpu_w8a8_quant timeout 3600 python tools/quantize_model.py --cpu \
  -c "$CHAIN/pipe_slim_ckpt.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 --synth --img-size 320 \
  --act-scales channel --bits 8 \
  -o "$CHAIN/acc/w8a8.msgpack"

[ -e outputs/logs/cpu_w8a8_quant.done ] && \
run_job cpu_w8a8_eval timeout 7200 python tools/eval_harness_ckpt.py --cpu \
  -c "$CHAIN/acc/w8a8.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 --quant w8a8 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320

# bf16 comparator on the same artifact (the pipeline's own slim self-eval
# also reports it, but this gives all three rows through ONE eval path)
run_job cpu_bf16_eval timeout 7200 python tools/eval_harness_ckpt.py --cpu \
  -c "$CHAIN/pipe_slim_ckpt.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320

echo "== CPU QUEUE R5B COMPLETE $(date -u)" | tee -a outputs/logs/cpu_queue.log
