#!/bin/bash
# Round-4 TPU queue, stage 4: small-batch serving LATENCY sweep at the
# production recipe (w8a8 per-channel slim, 640px, K=1024) + the stem6 /
# split_cat A/Bs in their hypothesized win zone (tiny batches, where the
# b128 measurements said "neutral/negative but may matter at the edge").
# Waits for queue r4c (if running) — single TPU client rule.
set -u
cd /root/repo
mkdir -p outputs/logs

probe() { timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; }

# serialize behind r4c
while [ -f /tmp/queue_r4c.pid ] && kill -0 "$(cat /tmp/queue_r4c.pid)" 2>/dev/null; do
  sleep 60
done

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

Q="python tools/bench_int8.py --only w8a8 --act-scales channel"

run_job lat_b1        timeout 3600 $Q -b 1
run_job lat_b4        timeout 3600 $Q -b 4
run_job lat_b8        timeout 3600 $Q -b 8
run_job lat_b1_stem6  timeout 3600 $Q -b 1 --stem6
run_job lat_b1_split  timeout 3600 $Q -b 1 --split-cat
run_job lat_b1_both   timeout 3600 $Q -b 1 --stem6 --split-cat

echo "== QUEUE R4D COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
