#!/bin/bash
# Final-session CPU sidecar #4: persist the edge artifact from THIS
# session's real chain (VERDICT r4 missing item 4) — ONNX export of the
# w8a8 slim M-P6 at 448px (P6 /64 alignment) with the calib-scale JSON,
# self-checked through the in-repo numpy ONNX evaluator.  Runs after the
# CPU w8a8 AP eval finishes (serial: one host core).
set -u
cd /root/repo
mkdir -p outputs/logs outputs/edge

for _ in $(seq 1 240); do
  [ -e outputs/logs/r5j_w8_eval_cpu.done ] && break
  [ -e outputs/logs/r5k_w8_eval.done ] && break
  sleep 60
done
# proceed if the quantized artifact exists at all — the eval may have
# been cut, the export is independently valuable
[ -e outputs/r5_mp6/acc_w8a8.msgpack ] || exit 1

if [ ! -e outputs/logs/r5j_edge.done ]; then
  echo "== r5j_edge: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  nice -n 15 timeout 5400 python tools/export_edge.py --cpu \
    -c outputs/r5_mp6/acc_w8a8.msgpack \
    --slim-spec outputs/r5_mp6/pipe_slim_spec.json \
    --depth 0.67 --width 0.75 --quant w8a8 --size 448 \
    --calib-json outputs/edge/mp6_w8a8_448_calib.json \
    -o outputs/edge/mp6_w8a8_448.onnx \
    > outputs/logs/r5j_edge.log 2>&1
  rc=$?
  echo "== r5j_edge: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  [ $rc -eq 0 ] && touch outputs/logs/r5j_edge.done
fi
