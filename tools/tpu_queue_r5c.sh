#!/bin/bash
# Round-5 TPU queue, stage C — XLA-flag A/B sweep on the headline
# inference program (the last untried single-chip lever: the roofline
# bracketing killed the memory-bound hypotheses, so remaining headroom,
# if any, is in the compiler's fusion/scheduling choices).  Each config
# is one fresh process (XLA_FLAGS is read at backend init) running the
# same bench_breakdown measurement as the headline.
# Waits for tpu_queue_r5b.sh (single TPU client rule).
set -u
cd /root/repo
mkdir -p outputs/logs

probe() { timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; }

t=0
while ! grep -q "QUEUE R5B COMPLETE" outputs/logs/queue.log 2>/dev/null; do
  if [ -f /tmp/queue_r5b.pid ] && ! kill -0 "$(cat /tmp/queue_r5b.pid)" 2>/dev/null; then
    echo "== r5b queue process gone — proceeding" | tee -a outputs/logs/queue.log
    break
  fi
  sleep 120; t=$((t + 120))
  [ "$t" -ge 36000 ] && { echo "r5c: gave up waiting"; exit 1; }
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

# baseline re-measure in the same session for a fair comparison
run_job xla_base timeout 1800 python tools/bench_int8.py \
  --only w8a8 -b 128 --act-scales channel

run_job xla_lhs timeout 1800 env \
  XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
  python tools/bench_int8.py --only w8a8 -b 128 --act-scales channel

run_job xla_vmem timeout 1800 env \
  XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
  python tools/bench_int8.py --only w8a8 -b 128 --act-scales channel

run_job xla_flags_combo timeout 1800 env \
  XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true --xla_tpu_scoped_vmem_limit_kib=65536" \
  python tools/bench_int8.py --only w8a8 -b 128 --act-scales channel

echo "== QUEUE R5C COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
