#!/bin/bash
# Final-session follow-up TPU queue (rev k) — launched manually only
# after tpu_queue_r5j.sh logs COMPLETE.  Value-ordered against the
# 02:20 killswitch:
#   1. w8a8 AP of the headline slim artifact (quantized on CPU by
#      cpu_queue_r5j2.sh) — completes the unified {spec, img/s, AP50}
#      triple under the exact bench numerics.
#   2. mag49_mp6_eval: AP of the reference-method (01->02->03 magnitude
#      0.49) chain ON the headline M-P6 architecture (ckpt from
#      cpu_queue_r5j.sh).
#   3. b1 latency of the chain spec at 640 (serving story refresh).
#   4. a longer tune budget (t40) from the same prune anchor, for the
#      recovery-budget column on the M-P6 frontier.
set -u
cd /root/repo
mkdir -p outputs/logs

probe() { timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; }

run_job() {
  local name="$1"; shift
  if [ -e "outputs/logs/${name}.done" ]; then
    echo "== ${name}: already done, skipping"; return 0
  fi
  if ! probe; then
    echo "== TUNNEL DOWN before ${name} — aborting queue" | tee -a outputs/logs/queue.log
    exit 3
  fi
  echo "== ${name}: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  "$@" > "outputs/logs/${name}.log" 2>&1
  local rc=$?
  echo "== ${name}: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  [ $rc -eq 0 ] && touch "outputs/logs/${name}.done"
  return 0
}

[ -e outputs/logs/r5j_w8_quant.done ] && \
run_job r5k_w8_eval timeout 1800 python tools/eval_harness_ckpt.py \
  -c outputs/r5_mp6/acc_w8a8.msgpack \
  --slim-spec outputs/r5_mp6/pipe_slim_spec.json \
  --depth 0.67 --width 0.75 --quant w8a8 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320 \
  -o outputs/r5_mp6/w8a8_self_eval.json

[ -e outputs/logs/r5j_mag49_gen.done ] && \
run_job r5k_mag49_eval timeout 1800 python tools/eval_harness_ckpt.py \
  -c outputs/r5_mag49_mp6/merged_49_ckpt.msgpack \
  --depth 0.67 --width 0.75 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320 \
  -o outputs/r5_mag49_mp6/self_eval.json

run_job r5k_b1_lat timeout 1800 python tools/bench_spec.py \
  --spec artifacts/mp6_chain_slim_spec.json --size 640 --batch 1 \
  --quant bf16

run_job r5k_mp6_t40 timeout 3600 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --arch-set depth 0.67 width 0.75 \
  --start-stage tune --init-from outputs/r5_mp6 \
  --tune-set max_epoch 40 --resume \
  --out outputs/r5_mp6_t40

echo "== QUEUE R5K COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
