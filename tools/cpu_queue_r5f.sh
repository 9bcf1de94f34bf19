#!/bin/bash
# Round-5 session-2 CPU queue (runs beside the TPU queue; nice -10 so the
# 1-core host keeps feeding the TPU chain).  Value order:
#   1. mag49: the REFERENCE's own 49% global-magnitude chain (01->02->03)
#      AP-measured in-framework for the first time (VERDICT r5 item 3).
#      Unstructured masks -> dense-compute speed; the comparison row is
#      "magnitude-49 AP50 vs dense phase2 0.8961 vs Taylor-chain points".
#   2. rob_expnorm: six-axis robustness with the adaptive exposure
#      normalization ON (VERDICT item 4 — lowlight was 0.164; the rescue
#      landed in data/folder.py AFTER the last robustness run).
#   3. edge: persist a real-chain edge artifact (VERDICT item 6) —
#      chainB_t30 w8a8 at 416px through export_edge + onnx_io parity.
#   4. mag49 on the M-P6 anchor once the TPU chain lands (the reference's
#      actual model class).
set -u
cd /root/repo
mkdir -p outputs/logs outputs/edge

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

# ---- 1. reference-method magnitude-49 chain on the tiny anchor ---------
run_job mag49_gen timeout 3600 env JAX_PLATFORMS=cpu \
  python tools/compress_pipeline.py \
  -c outputs/r5_chain/pipe_phase2/best_ckpt.msgpack \
  --ratio 0.49 -o outputs/r5_mag49
run_job mag49_eval timeout 7200 python tools/eval_harness_ckpt.py --cpu \
  -c outputs/r5_mag49/merged_49_ckpt.msgpack \
  --depth 0.33 --width 0.25 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320

# ---- 2. robustness with the exposure-norm rescue ------------------------
run_job rob_bt30_expnorm timeout 14400 python tools/eval_robustness.py --cpu \
  --exposure-norm \
  -c outputs/r5_chainB_t30/pipe_slim_ckpt.msgpack \
  --slim-spec outputs/r5_chainB_t30/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --img-size 320 \
  -o outputs/r5_chainB_t30/robustness6_expnorm.json

# ---- 3. real-chain edge artifact ----------------------------------------
run_job edge_bt30 timeout 3600 python tools/export_edge.py --cpu \
  -c outputs/r5_chainB_t30/acc/w8a8.msgpack \
  --slim-spec outputs/r5_chainB_t30/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --quant w8a8 --size 416 \
  --calib-json outputs/edge/bt30_w8a8_416_calib.json \
  -o outputs/edge/bt30_w8a8_416.onnx

# ---- 4. magnitude-49 on the M-P6 anchor (the reference's model class) ---
if wait_for r5e_mp6 21600; then
  run_job mag49_mp6_gen timeout 7200 env JAX_PLATFORMS=cpu \
    python tools/compress_pipeline.py \
    -c outputs/r5_mp6/pipe_phase2/best_ckpt.msgpack \
    --ratio 0.49 -o outputs/r5_mag49_mp6
  run_job mag49_mp6_eval timeout 14400 python tools/eval_harness_ckpt.py --cpu \
    -c outputs/r5_mag49_mp6/merged_49_ckpt.msgpack \
    --depth 0.67 --width 0.75 \
    --data-dir /tmp/cocodet_synth_coco --img-size 320
fi

echo "== CPU QUEUE R5F COMPLETE $(date -u)" | tee -a outputs/logs/cpu_queue.log
