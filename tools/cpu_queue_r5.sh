#!/bin/bash
# Round-5 CPU accuracy queue — runs AFTER the r5 chain artifacts land
# (CPU-forced jax processes are safe alongside the TPU queue; the two
# compete only for the 1-core host, so everything here runs nice'd).
# Measures the two NEW held-out robustness axes (smallobj, lowlight —
# data/synthetic.py round-4 additions) plus the original four on the
# regenerated chain ckpts, giving the cross-round robustness table its
# round-4 row set.
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

# robustness (now 6 axes) on the deep-compression point (60% params)
wait_for r5_chain 14400 && \
run_job rob_r5_chain timeout 14400 python tools/eval_robustness.py --cpu \
  -c outputs/r5_chain/pipe_slim_ckpt.msgpack \
  --slim-spec outputs/r5_chain/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --img-size 320 \
  -o outputs/r5_chain/robustness6.json

# robustness on the quality point after the doubled tune (86% params)
wait_for r5_chainB_t30 21600 && \
run_job rob_chainB_t30 timeout 14400 python tools/eval_robustness.py --cpu \
  -c outputs/r5_chainB_t30/pipe_slim_ckpt.msgpack \
  --slim-spec outputs/r5_chainB_t30/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --img-size 320 \
  -o outputs/r5_chainB_t30/robustness6.json

echo "== CPU QUEUE R5 COMPLETE $(date -u)" | tee -a outputs/logs/cpu_queue.log
