#!/bin/bash
# Session-7 TPU tail — runs ONLY after the frontier queue's watchdog
# exits (serialized on the single-client tunnel):
#   1. re-run the native real-image detection with the LAYOUT-FIXED
#      runner (session-7 fix: ReadBufferAsFloatLogical — the session-6
#      run read the transposed boxes buffer as row-major)
#   2. device traces at the PRODUCTION operating points (the session-6
#      traces were b32/320): train step b128/640, headline infer b128/640
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
    echo "== TUNNEL DOWN before ${name} — aborting tail" | tee -a outputs/logs/queue.log
    exit 3
  fi
  echo "== ${name}: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  "$@" > "outputs/logs/${name}.log" 2>&1
  local rc=$?
  echo "== ${name}: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  [ $rc -eq 0 ] && touch "outputs/logs/${name}.done"
  return 0
}

# wait for the main frontier queue: its watchdog pid must be gone
MAIN_WD=$(cat /tmp/watchdog_r5.pid 2>/dev/null || echo "")
if [ -n "$MAIN_WD" ]; then
  while kill -0 "$MAIN_WD" 2>/dev/null; do sleep 60; done
fi
echo "== S7 TAIL starting $(date -u)" | tee -a outputs/logs/queue.log

run_job t2_detect timeout 1800 env \
  AXON_POOL_SVC_OVERRIDE=127.0.0.1 AXON_LOOPBACK_RELAY=1 \
  ./serving/pjrt_runner /opt/axon/libaxon_pjrt.so \
  outputs/serving/r5b_det.mlir \
  outputs/serving/r5b_det.compile_options.pb 1 320 320 5 \
  --image outputs/serving/scene.ppm \
  --out outputs/serving/scene_det2.ppm --conf 0.25

run_job t2_trace_train640 timeout 2400 python tools/profile_trace.py \
  --program step -b 128 --size 640 --iters 3 -o outputs/trace_train640

run_job t2_trace_infer640 timeout 2400 python tools/profile_trace.py \
  --program infer -b 128 --size 640 --iters 3 -o outputs/trace_infer640

echo "== S7 TAIL COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
