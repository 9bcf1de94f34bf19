#!/bin/bash
# Round-5 CPU accuracy queue — runs CPU-forced evals as the TPU queue's
# chain artifacts land (safe to run concurrently with the TPU queue: every
# job here is --cpu / --no-half and never touches the tunnel).
#
# Job 1 (VERDICT r3 weak-#5): quantify the slim rim approximation on a
# bias-carrying pruned chain.  pipe_merged is the EXACT dense fold of the
# masked model (dead channels carried as bias constants, correct at
# borders); pipe_slim removes the channels and folds act(offset) into
# k>1 consumers' biases, over-counting the SAME-pad rim by one pixel per
# consumer.  Evaluating both in f32 on the same val set isolates the
# rim's AP effect from every other factor.
set -u
cd /root/repo
mkdir -p outputs/logs
DATA=/tmp/cocodet_synth_coco

wait_for() {
  local marker="$1" limit_s="${2:-21600}" t=0
  while [ ! -e "$marker" ]; do
    sleep 120; t=$((t + 120))
    if [ "$t" -ge "$limit_s" ]; then
      echo "== acc_queue: gave up waiting for $marker" \
        | tee -a outputs/logs/acc_queue.log
      return 1
    fi
  done
}

run_job() {
  local name="$1"; shift
  [ -e "outputs/logs/${name}.done" ] && return 0
  echo "== ${name}: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/acc_queue.log
  "$@" > "outputs/logs/${name}.log" 2>&1
  local rc=$?
  echo "== ${name}: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/acc_queue.log
  [ $rc -eq 0 ] && touch "outputs/logs/${name}.done"
  return 0
}

wait_for outputs/logs/r5_chain.done || exit 1

run_job rim_merged_f32 timeout 7200 python tools/eval_harness_ckpt.py --cpu \
  --no-half -c outputs/r5_chain/pipe_merged_ckpt.msgpack \
  --depth 0.33 --width 0.25 \
  --data-dir "$DATA" --img-size 320 \
  -o outputs/r5_chain/rim_merged_f32.json

run_job rim_slim_f32 timeout 7200 python tools/eval_harness_ckpt.py --cpu \
  --no-half -c outputs/r5_chain/pipe_slim_ckpt.msgpack \
  --slim-spec outputs/r5_chain/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 \
  --data-dir "$DATA" --img-size 320 \
  -o outputs/r5_chain/rim_slim_f32.json

echo "== ACC QUEUE R5 COMPLETE $(date -u)" | tee -a outputs/logs/acc_queue.log
