#!/bin/bash
# Final-session CPU sidecar #3: CPU fallback for the headline w8a8 AP
# self-eval (the TPU follow-up queue may be cut by the killswitch).
# Waits for sidecar #2's quantized artifact, then scores it on the host
# (nice'd — yields to the TPU chain's input pipeline).  CPU robustness
# evals matched the TPU harness self-eval to 5e-4 in round 4
# (ROADMAP.md), so this number is quotable either way.
set -u
cd /root/repo
mkdir -p outputs/logs

for _ in $(seq 1 220); do
  [ -e outputs/logs/r5j_w8_quant.done ] && break
  sleep 60
done
[ -e outputs/logs/r5j_w8_quant.done ] || exit 1

if [ ! -e outputs/logs/r5j_w8_eval_cpu.done ]; then
  echo "== r5j_w8_eval_cpu: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  nice -n 15 timeout 10800 python tools/eval_harness_ckpt.py --cpu \
    -c outputs/r5_mp6/acc_w8a8.msgpack \
    --slim-spec outputs/r5_mp6/pipe_slim_spec.json \
    --depth 0.67 --width 0.75 --quant w8a8 \
    --data-dir /tmp/cocodet_synth_coco --img-size 320 \
    -o outputs/r5_mp6/w8a8_self_eval_cpu.json \
    > outputs/logs/r5j_w8_eval_cpu.log 2>&1
  rc=$?
  echo "== r5j_w8_eval_cpu: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  [ $rc -eq 0 ] && touch outputs/logs/r5j_w8_eval_cpu.done
fi
