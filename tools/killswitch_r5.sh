#!/bin/bash
# Session killswitch: the queue runners are nohup'd and would OUTLIVE the
# builder session; the driver's end-of-round bench.py then shares the
# single-client TPU tunnel with whatever job is still running and wedges
# (exactly how BENCH_r02 died).  This script sleeps until the given UTC
# deadline, then kills every recorded queue runner AND its descendants
# (explicit pid walk — never pattern-matched kills).
#   usage: killswitch_r5.sh <HH:MM-UTC>   (default 02:00)
set -u
DEADLINE=${1:-02:00}

now=$(date -u +%s)
target=$(date -u -d "today ${DEADLINE}" +%s)
[ "$target" -le "$now" ] && target=$(date -u -d "tomorrow ${DEADLINE}" +%s)
sleep $((target - now))

descendants() {
  local kids
  kids=$(cat /proc/"$1"/task/*/children 2>/dev/null)
  local k
  for k in $kids; do echo "$k"; descendants "$k"; done
}

echo "== KILLSWITCH fired $(date -u) — stopping all queue runners" \
  | tee -a /root/repo/outputs/logs/queue.log
for f in /tmp/watchdog_r5.pid /tmp/queue_r5.pid /tmp/queue_r5_tail.pid \
         /tmp/cpu_queue_r5.pid /tmp/cpu_queue_r5b.pid; do
  [ -f "$f" ] || continue
  p=$(cat "$f")
  kill -0 "$p" 2>/dev/null || continue
  ds=$(descendants "$p")
  kill -9 "$p" 2>/dev/null
  for d in $ds; do kill -9 "$d" 2>/dev/null; done
  echo "   killed runner $p (+ $(echo $ds | wc -w) descendants)" \
    | tee -a /root/repo/outputs/logs/queue.log
done
echo "== KILLSWITCH done — tunnel free for the driver bench" \
  | tee -a /root/repo/outputs/logs/queue.log
