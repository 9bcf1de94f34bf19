#!/bin/bash
# Final-session CPU sidecar: as soon as the r5_mp6 phase-2 anchor is
# finished (signalled by the prune stage directory appearing), run the
# REFERENCE-METHOD compression chain (01->02->03: global magnitude mask
# at --ratio 0.49, BN-fold, mask-multiply) on it — pure host eager math,
# zero tunnel use, so it overlaps the TPU chain.  The AP eval of the
# result runs on the TPU afterwards (tpu follow-up queue).
set -u
cd /root/repo
mkdir -p outputs/logs

for _ in $(seq 1 180); do
  [ -d outputs/r5_mp6/pipe_prune ] && break
  sleep 60
done
if [ ! -d outputs/r5_mp6/pipe_prune ]; then
  echo "cpu_r5j: phase2 never landed" | tee -a outputs/logs/queue.log
  exit 1
fi

if [ ! -e outputs/logs/r5j_mag49_gen.done ]; then
  echo "== r5j_mag49_gen: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  nice -n 15 env JAX_PLATFORMS=cpu timeout 7200 \
    python tools/compress_pipeline.py \
    -c outputs/r5_mp6/pipe_phase2/latest_ckpt.msgpack \
    --ratio 0.49 -o outputs/r5_mag49_mp6 \
    > outputs/logs/r5j_mag49_gen.log 2>&1
  rc=$?
  echo "== r5j_mag49_gen: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  [ $rc -eq 0 ] && touch outputs/logs/r5j_mag49_gen.done
fi
