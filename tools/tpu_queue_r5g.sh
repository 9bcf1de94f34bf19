#!/bin/bash
# Round-5 session-2 TPU queue, rev f — replaces r5e after its bench gate
# + chain40_t60 resume landed (shared .done markers skip them).  Changes
# vs r5e, in value order for the 16:00 killswitch horizon:
#   - cheap high-value jobs moved AHEAD of the 3h mp6 chain: bt30_640
#     (VERDICT item 1a) and grad_conv_ab (VERDICT item 7's layout A/B);
#   - NEW r5f_mp6_deep: a second prune+tune from the same mp6 phase-2
#     anchor at the bench-comparable ~49% channel cut (108 events x
#     118 ch = 12744 of 25968), so the unified headline can hold the
#     >=2x throughput bar with a measured AP50 — the 96ch/17.7% cut
#     alone would land an honest but slow spec;
#   - bench both specs; the artifacts/ default is chosen at session end
#     from the measured {img/s, AP50} pairs.
# Single TPU client at all times; probe 8093 between jobs.
set -u
cd /root/repo
mkdir -p outputs/logs artifacts

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

require() { [ -e "outputs/logs/$1.done" ]; }

# 0. Gate + resume tune (normally already .done from the r5e run).
run_job r5e_bench_gate timeout 1800 python bench.py --random-pattern
run_job r5e_chain40_t60 timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage tune --init-from outputs/r5_chain \
  --tune-set max_epoch 60 --resume \
  --out outputs/r5_chain40_t60

# 1. Cheap, loses-nothing-if-killed-later measurements FIRST.
run_job r5e_bt30_640 timeout 1800 env _COCODET_BENCH_ARCH=0.33,0.25 \
  python tools/bench_spec.py \
  --spec outputs/r5_chainB_t30/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --size 640 --batch 128 --quant w8a8
run_job r5f_gradconv timeout 2400 python tools/grad_conv_ab.py --batch 128

# 2. THE headline chain: M-P6 architecture end-to-end (~17.7% cut).
run_job r5e_mp6 timeout 21600 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --arch-set depth 0.67 width 0.75 \
  --prune-set prune_channels 96 \
  --tune-set max_epoch 30 \
  --resume --out outputs/r5_mp6

if require r5e_mp6; then
  cp outputs/r5_mp6/pipe_slim_spec.json artifacts/mp6_chain_slim_spec.json
  cp outputs/r5_mp6/pipeline_results.json artifacts/mp6_chain_results.json
fi
require r5e_mp6 && \
run_job r5e_mp6_bench timeout 1800 python bench.py

run_job r5g_gradconv2 timeout 2400 python tools/grad_conv_ab.py --batch 128

# 3. Deep cut from the SAME phase-2 anchor: 30-epoch gentle prune
#    (108 events x 118 ch = 49.1% of channels — the bench-comparable
#    density) + 30-epoch recovery tune.
require r5e_mp6 && \
run_job r5f_mp6_deep timeout 14400 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --arch-set depth 0.67 width 0.75 \
  --start-stage prune --init-from outputs/r5_mp6 \
  --prune-set prune_channels 118 max_epoch 30 prune_end_epoch 27 \
  --tune-set max_epoch 20 \
  --resume --out outputs/r5_mp6_deep

require r5f_mp6_deep && \
run_job r5f_mp6_deep_bench timeout 1800 python bench.py \
  --spec outputs/r5_mp6_deep/pipe_slim_spec.json

# 4. Reference operating point: 832/b16, w8a8 vs bf16, p50/p99 —
#    on the deep spec if it landed, else the moderate one.
SPEC=artifacts/mp6_chain_slim_spec.json
require r5f_mp6_deep && SPEC=outputs/r5_mp6_deep/pipe_slim_spec.json
require r5e_mp6 && \
run_job r5e_lat832_w8a8 timeout 1800 python tools/bench_spec.py \
  --spec "$SPEC" --size 832 --batch 16 --quant w8a8
require r5e_mp6 && \
run_job r5e_lat832_bf16 timeout 1800 python tools/bench_spec.py \
  --spec "$SPEC" --size 832 --batch 16 --quant bf16
require r5e_mp6 && \
run_job r5e_640_bf16 timeout 1800 python tools/bench_spec.py \
  --spec "$SPEC" --size 640 --batch 128 --quant bf16

# Post-ADVICE-fix train-step requotes (after the headline chain work).
run_job r5g_train_base timeout 1800 python tools/bench_train.py \
  -b 128 --size 640 --iters 10
run_job r5g_train_bf16cost timeout 1800 python tools/bench_train.py \
  -b 128 --size 640 --iters 10 --simota-bf16

# 5. simota_bf16 chain-level AP A/B (deterministic vs outputs/r5_chain).
run_job r5e_simota timeout 14400 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --arch-set simota_bf16 True \
  --resume --out outputs/r5_simota

# 6. Recovery-budget stretch: the 80.4%-param point at t60 + distill 2.0.
run_job r5e_chainC timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage prune --init-from outputs/r5_chain \
  --prune-set prune_channels 32 --resume \
  --out outputs/r5_chainC
require r5e_chainC && \
run_job r5e_chainC_t60 timeout 10800 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage tune --init-from outputs/r5_chainC \
  --tune-set max_epoch 60 --resume \
  --out outputs/r5_chainC_t60
require r5e_chainC && \
run_job r5e_chainC_t30d2 timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage tune --init-from outputs/r5_chainC \
  --tune-set max_epoch 30 distill_coefficient 2.0 --resume \
  --out outputs/r5_chainC_t30d2

echo "== QUEUE R5G COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
