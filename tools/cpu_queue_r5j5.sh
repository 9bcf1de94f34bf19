#!/bin/bash
# Final-session CPU sidecar #5: AP of the reference-method magnitude-49
# chain on the M-P6 anchor (dense compute, 25.1M nonzero params), scored
# on the host after the edge export frees the core.  Slow (dense M-P6 on
# 1 CPU core) but pure-CPU — safe to outlive the session.
set -u
cd /root/repo
mkdir -p outputs/logs

for _ in $(seq 1 300); do
  [ -e outputs/logs/r5j_edge.done ] && break
  sleep 60
done

if [ ! -e outputs/logs/r5j_mag49_eval_cpu.done ]; then
  echo "== r5j_mag49_eval_cpu: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  nice -n 15 timeout 21600 python tools/eval_harness_ckpt.py --cpu \
    -c outputs/r5_mag49_mp6/merged_49_ckpt.msgpack \
    --depth 0.67 --width 0.75 \
    --data-dir /tmp/cocodet_synth_coco --img-size 320 \
    -o outputs/r5_mag49_mp6/self_eval.json \
    > outputs/logs/r5j_mag49_eval_cpu.log 2>&1
  rc=$?
  echo "== r5j_mag49_eval_cpu: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  [ $rc -eq 0 ] && touch outputs/logs/r5j_mag49_eval_cpu.done
fi
