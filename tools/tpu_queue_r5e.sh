#!/bin/bash
# Round-5 session-2 TPU queue — unify the headline (VERDICT r5 item 1):
#   1. bench_gate: the known w8a8 recipe (validates tunnel + the new
#      regression guard against the 2565-2588 band).
#   2. chain40_t60 RESUME: the killed 60-epoch tune restarts at epoch 51
#      (run_pipeline --resume), closing the recovery-budget sweep.
#   3. r5_mp6: the synthetic chain ON THE HEADLINE ARCHITECTURE
#      (d0.67/w0.75, prune 96ch/event -> ~17.7% of 25968 channels, 30-ep
#      recovery tune) -> a slim spec whose AP50 is measured in-chain.
#   4. mp6_bench: bench.py --spec <that spec> = the unified
#      {slim spec, img/s, AP50} headline at 640/b128 w8a8.
#   5. lat832_*: the reference's winning operating point (832/b16, ref
#      choijhanyangackr/config/yolox_m_p6_sparse.json) — w8a8 vs bf16 +
#      p50/p99 per-image latency on the measured-AP spec.
#   6. bt30_640: the tiny chainB_t30 artifact (AP50 0.8887 w8a8) timed at
#      640/b128 — the frontier table's throughput column.
#   7. r5_simota: full tiny chain with simota_bf16 on — chain-level AP
#      A/B for the +3.8% training-throughput lever (VERDICT item 7).
#   8. chainC_t60 / chainC_t30d2: recovery-budget stretch points.
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

# 1. Driver bench gate with the regression guard live.
run_job r5e_bench_gate timeout 1800 python bench.py --random-pattern

# 2. Close the killed recovery sweep: resume tune at epoch 51/60.
run_job r5e_chain40_t60 timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage tune --init-from outputs/r5_chain \
  --tune-set max_epoch 60 --resume \
  --out outputs/r5_chain40_t60

# 3. THE headline chain: M-P6 architecture end-to-end.
run_job r5e_mp6 timeout 21600 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --arch-set depth 0.67 width 0.75 \
  --prune-set prune_channels 96 \
  --tune-set max_epoch 30 \
  --resume --out outputs/r5_mp6

# 4. Unified headline: bench the measured-AP spec; persist it (+ the AP
#    provenance) into artifacts/ so bench.py defaults to it from now on.
if require r5e_mp6; then
  cp outputs/r5_mp6/pipe_slim_spec.json artifacts/mp6_chain_slim_spec.json
  cp outputs/r5_mp6/pipeline_results.json artifacts/mp6_chain_results.json
fi
require r5e_mp6 && \
run_job r5e_mp6_bench timeout 1800 python bench.py

# 5. Reference operating point: 832/b16, w8a8 vs bf16, p50/p99.
require r5e_mp6 && \
run_job r5e_lat832_w8a8 timeout 1800 python tools/bench_spec.py \
  --spec artifacts/mp6_chain_slim_spec.json --size 832 --batch 16 \
  --quant w8a8
require r5e_mp6 && \
run_job r5e_lat832_bf16 timeout 1800 python tools/bench_spec.py \
  --spec artifacts/mp6_chain_slim_spec.json --size 832 --batch 16 \
  --quant bf16
# 640/b128 on the same spec: the headline point's bf16 A/B.
require r5e_mp6 && \
run_job r5e_640_bf16 timeout 1800 python tools/bench_spec.py \
  --spec artifacts/mp6_chain_slim_spec.json --size 640 --batch 128 \
  --quant bf16

# 6. The tiny chainB_t30 artifact's throughput column (VERDICT 1a).
run_job r5e_bt30_640 timeout 1800 env _COCODET_BENCH_ARCH=0.33,0.25 \
  python tools/bench_spec.py \
  --spec outputs/r5_chainB_t30/pipe_slim_spec.json \
  --depth 0.33 --width 0.25 --size 640 --batch 128 --quant w8a8

# 7. simota_bf16 chain-level AP A/B (deterministic vs outputs/r5_chain).
run_job r5e_simota timeout 14400 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --arch-set simota_bf16 True \
  --resume --out outputs/r5_simota

# 8. Recovery-budget stretch: the 80.4%-param point at t60 + distill 2.0.
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

echo "== QUEUE R5E COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
