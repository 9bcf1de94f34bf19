#!/bin/bash
# Supplemental CPU redo queue: robustness with the fixed crush gate +
# the P6-aligned 448px edge artifact.
set -u
cd /root/repo
run_job() {
  local name="$1"; shift
  [ -e "outputs/logs/${name}.done" ] && { echo "== ${name}: done, skip"; return 0; }
  echo "== ${name}: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/cpu_queue.log
  nice -n 10 "$@" > "outputs/logs/${name}.log" 2>&1
  local rc=$?
  echo "== ${name}: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/cpu_queue.log
  [ $rc -eq 0 ] && touch "outputs/logs/${name}.done"
  return 0
}
run_job rob_bt30_expnorm2 timeout 14400 python tools/eval_robustness.py --cpu \
  --exposure-norm \
  -c outputs/r5_chainB_t30/pipe_slim_ckpt.msgpack \
  --slim-spec outputs/r5_chainB_t30/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --img-size 320 \
  -o outputs/r5_chainB_t30/robustness6_expnorm.json
run_job edge_bt30_448 timeout 3600 python tools/export_edge.py --cpu \
  -c outputs/r5_chainB_t30/acc/w8a8.msgpack \
  --slim-spec outputs/r5_chainB_t30/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --quant w8a8 --size 448 \
  --calib-json outputs/edge/bt30_w8a8_448_calib.json \
  -o outputs/edge/bt30_w8a8_448.onnx
echo "== CPU QUEUE R5G COMPLETE $(date -u)" | tee -a outputs/logs/cpu_queue.log
