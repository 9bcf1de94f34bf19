#!/bin/bash
# Wedge-proof runner for the r5 TPU queue: the tunnel's known failure
# mode is a remote-compile POST that never returns (the client blocks
# forever at ~0% CPU — bench.py got a phase-aware watchdog for this in
# round 4, but run_pipeline has none and a wedged chain burns the whole
# session, as almost happened at 22:35 tonight).  This wrapper
#   1. runs tpu_queue_r5.sh (idempotent: .done markers skip finished
#      jobs, so a relaunch resumes exactly where the kill happened);
#   2. watches the queue's python descendant: if its cumulative CPU
#      advances < 0.5 s over 15 consecutive minutes it is declared
#      wedged (a healthy compile blocks 3-6 min; the budget matches
#      bench.py's 900 s compile deadline) and killed;
#   3. retries, up to $MAX_ATTEMPTS total queue launches.
set -u
cd /root/repo
MAX_ATTEMPTS=${MAX_ATTEMPTS:-4}
QUEUE=${QUEUE:-tools/tpu_queue_r5.sh}
DONE_MARKER=${DONE_MARKER:-outputs/logs/r5_chainB_t30.done}

descendants() {
  local kids
  kids=$(cat /proc/"$1"/task/*/children 2>/dev/null)
  local k
  for k in $kids; do echo "$k"; descendants "$k"; done
}

py_child() {  # newest python descendant of $1
  local k last=""
  for k in $(descendants "$1"); do
    grep -aq "python" /proc/"$k"/comm 2>/dev/null && last=$k
  done
  echo "$last"
}

cpu_ticks() { awk '{print $14 + $15}' /proc/"$1"/stat 2>/dev/null || echo ""; }

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "== watchdog: queue attempt ${attempt} $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  bash "$QUEUE" &
  QPID=$!
  echo "$QPID" > /tmp/queue_r5.pid

  stall=0; last_pid=""; last_ticks=0
  while kill -0 "$QPID" 2>/dev/null; do
    sleep 60
    pid=$(py_child "$QPID")
    if [ -z "$pid" ]; then stall=0; continue; fi
    ticks=$(cpu_ticks "$pid")
    [ -z "$ticks" ] && { stall=0; continue; }
    if [ "$pid" = "$last_pid" ] && [ $((ticks - last_ticks)) -lt 50 ]; then
      stall=$((stall + 60))
    else
      stall=0
    fi
    # CPU ticks alone false-positive on healthy TPU-bound stages (the
    # M-P6 distill tune is ~99% device-wait: <0.5 s host CPU/min killed a
    # live job at r5 epoch 8) — a job that is still WRITING ITS LOG is
    # not wedged, whatever its CPU counter says.
    newest_log=$(ls -t outputs/logs/*.log 2>/dev/null | head -1)
    if [ -n "$newest_log" ]; then
      age=$(( $(date +%s) - $(stat -c %Y "$newest_log") ))
      [ "$age" -lt 300 ] && stall=0
    fi
    last_pid=$pid; last_ticks=$ticks
    if [ "$stall" -ge 900 ]; then
      echo "== watchdog: pid ${pid} wedged (no CPU for ${stall}s) — killing $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
      kill -9 "$pid" 2>/dev/null
      stall=0
    fi
  done
  wait "$QPID" 2>/dev/null

  [ -e "$DONE_MARKER" ] && break
done
echo "== watchdog: finished after attempt ${attempt} $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
