#!/bin/bash
# Final-session CPU sidecar #2: when the r5_mp6 chain's slim artifact
# lands, quantize it w8a8 per-channel on the host (eager math, no
# tunnel) so the TPU follow-up queue only pays the AP eval.
set -u
cd /root/repo
mkdir -p outputs/logs

for _ in $(seq 1 200); do
  [ -e outputs/r5_mp6/pipe_slim_ckpt.msgpack ] && \
  [ -e outputs/r5_mp6/pipe_slim_spec.json ] && break
  sleep 60
done
if [ ! -e outputs/r5_mp6/pipe_slim_ckpt.msgpack ]; then
  echo "cpu_r5j2: slim artifact never landed" | tee -a outputs/logs/queue.log
  exit 1
fi
sleep 10  # let the writer finish

if [ ! -e outputs/logs/r5j_w8_quant.done ]; then
  echo "== r5j_w8_quant: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  nice -n 15 timeout 7200 python tools/quantize_model.py --cpu \
    -c outputs/r5_mp6/pipe_slim_ckpt.msgpack \
    --slim-spec outputs/r5_mp6/pipe_slim_spec.json \
    --depth 0.67 --width 0.75 --synth --img-size 320 \
    --act-scales channel --bits 8 \
    -o outputs/r5_mp6/acc_w8a8.msgpack \
    > outputs/logs/r5j_w8_quant.log 2>&1
  rc=$?
  echo "== r5j_w8_quant: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  [ $rc -eq 0 ] && touch outputs/logs/r5j_w8_quant.done
fi
