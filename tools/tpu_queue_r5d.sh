#!/bin/bash
# Round-5 TPU queue, stage D — training-MFU A/Bs (VERDICT r3 weak #1:
# 472 ms @ b128/640 = 271 img/s ~ 36% MFU; target >= 375 img/s or a
# measurement-backed ceiling writeup).  The r3 bisection left two untried
# levers, each measured here as one fresh process:
#   1. bf16 SimOTA cost matrices (--simota-bf16): halves the (B, G, A)
#      assignment HBM traffic; assignment-only approximation (agreement
#      test in tests/test_ops.py).
#   2. XLA latency-hiding scheduler / scoped-vmem flags on the TRAIN
#      program (r5c sweeps them on inference only).
# Plus a train-program device-trace attempt (r5b traces infer only).
# Waits for tpu_queue_r5c.sh (single TPU client rule).
set -u
cd /root/repo
mkdir -p outputs/logs

probe() { timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; }

t=0
while ! grep -q "QUEUE R5C COMPLETE" outputs/logs/queue.log 2>/dev/null; do
  if [ -f /tmp/queue_r5c.pid ] && ! kill -0 "$(cat /tmp/queue_r5c.pid)" 2>/dev/null; then
    echo "== r5c queue process gone — proceeding" | tee -a outputs/logs/queue.log
    break
  fi
  sleep 120; t=$((t + 120))
  [ "$t" -ge 43200 ] && { echo "r5d: gave up waiting"; exit 1; }
done

run_job() {
  local name="$1"; shift
  if [ -e "outputs/logs/${name}.done" ]; then
    echo "== ${name}: already done, skipping"; return 0
  fi
  if ! probe; then
    echo "== TUNNEL DOWN before ${name} — aborting" | tee -a outputs/logs/queue.log
    exit 3
  fi
  echo "== ${name}: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  "$@" > "outputs/logs/${name}.log" 2>&1
  local rc=$?
  echo "== ${name}: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  [ $rc -eq 0 ] && touch "outputs/logs/${name}.done"
  return 0
}

# baseline re-measure in the same session (fair comparison; r3 anchor 472 ms)
run_job train_base timeout 1800 python tools/bench_train.py -b 128 --size 640 --iters 10

run_job train_bf16cost timeout 1800 python tools/bench_train.py \
  -b 128 --size 640 --iters 10 --simota-bf16

run_job train_lhs timeout 1800 env \
  XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
  python tools/bench_train.py -b 128 --size 640 --iters 10

run_job train_combo timeout 1800 env \
  XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
  python tools/bench_train.py -b 128 --size 640 --iters 10 --simota-bf16

# device-trace attempt on the TRAIN program (fusion-level MFU evidence,
# SURVEY §5.1; works iff the tunnel forwards the profiler stream)
run_job train_trace timeout 2400 python tools/profile_trace.py \
  --program step -b 32 --size 320 --iters 3 -o outputs/trace_train

echo "== QUEUE R5D COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
