#!/bin/bash
# Consolidated post-mp6 CPU queue (replaces the waiting tail of
# cpu_queue_r5f): once the M-P6 chain lands, measure (1) the reference's
# magnitude-49 method on the M-P6 anchor, (2) w8a8 AP provenance for the
# headline spec (the unified triple should be w8a8-consistent), and the
# same for the deep-cut chain when it lands.  ONE serial queue: the
# 1-core host also feeds the TPU chain.
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
wait_for() {
  local t=0
  while [ ! -e "outputs/logs/$1.done" ]; do
    sleep 120; t=$((t + 120))
    [ "$t" -ge "$2" ] && return 1
  done
  return 0
}

wait_for r5e_mp6 21600 || { echo "cpu_r5i: mp6 never landed"; exit 1; }

# w8a8 AP of the headline spec artifact (chain slim ckpt, per-channel)
run_job mp6_w8_quant timeout 7200 python tools/quantize_model.py --cpu \
  -c outputs/r5_mp6/pipe_slim_ckpt.msgpack \
  --slim-spec outputs/r5_mp6/pipe_slim_spec.json \
  --depth 0.67 --width 0.75 --synth --img-size 320 \
  --act-scales channel --bits 8 \
  -o outputs/r5_mp6/acc_w8a8.msgpack
run_job mp6_w8_eval timeout 14400 python tools/eval_harness_ckpt.py --cpu \
  -c outputs/r5_mp6/acc_w8a8.msgpack \
  --slim-spec outputs/r5_mp6/pipe_slim_spec.json \
  --depth 0.67 --width 0.75 --quant w8a8 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320

# the reference's own method on the reference's model class
run_job mag49_mp6_gen timeout 7200 env JAX_PLATFORMS=cpu \
  python tools/compress_pipeline.py \
  -c outputs/r5_mp6/pipe_phase2/best_ckpt.msgpack \
  --ratio 0.49 -o outputs/r5_mag49_mp6
run_job mag49_mp6_eval timeout 14400 python tools/eval_harness_ckpt.py --cpu \
  -c outputs/r5_mag49_mp6/merged_49_ckpt.msgpack \
  --depth 0.67 --width 0.75 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320

# deep-cut chain: same pair once it lands
if wait_for r5f_mp6_deep 18000; then
  run_job deep_w8_quant timeout 7200 python tools/quantize_model.py --cpu \
    -c outputs/r5_mp6_deep/pipe_slim_ckpt.msgpack \
    --slim-spec outputs/r5_mp6_deep/pipe_slim_spec.json \
    --depth 0.67 --width 0.75 --synth --img-size 320 \
    --act-scales channel --bits 8 \
    -o outputs/r5_mp6_deep/acc_w8a8.msgpack
  run_job deep_w8_eval timeout 14400 python tools/eval_harness_ckpt.py --cpu \
    -c outputs/r5_mp6_deep/acc_w8a8.msgpack \
    --slim-spec outputs/r5_mp6_deep/pipe_slim_spec.json \
    --depth 0.67 --width 0.75 --quant w8a8 \
    --data-dir /tmp/cocodet_synth_coco --img-size 320
fi
echo "== CPU QUEUE R5I COMPLETE $(date -u)" | tee -a outputs/logs/cpu_queue.log
