#!/bin/bash
# Round-4 TPU queue, stage 5: end-to-end native serving validation of the
# PRODUCTION recipe — chainB slim + w8a8 per-channel artifact exported to
# StableHLO and executed by the C++ PJRT runner + batching server on the
# v5e.  Waits for queue r4d (single TPU client rule).
set -u
cd /root/repo
mkdir -p outputs/logs outputs/serving

probe() { timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; }

while [ -f /tmp/queue_r4d.pid ] && kill -0 "$(cat /tmp/queue_r4d.pid)" 2>/dev/null; do
  sleep 60
done

run_job() {
  local name="$1"; shift
  if [ -e "outputs/logs/${name}.done" ]; then
    echo "== ${name}: already done, skipping"; return 0
  fi
  echo "== ${name}: start $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  "$@" > "outputs/logs/${name}.log" 2>&1
  local rc=$?
  echo "== ${name}: rc=${rc} end $(date -u +%H:%M:%S)" | tee -a outputs/logs/queue.log
  [ $rc -eq 0 ] && touch "outputs/logs/${name}.done"
  return 0
}

# 1) export (host CPU — leaves the tunnel alone)
run_job serve_export timeout 1800 python tools/export_stablehlo.py \
  -n yolox-m-p6 --depth 0.33 --width 0.25 \
  -c outputs/r4_chainB/acc/int8_channel.msgpack \
  --slim-spec outputs/r4_chainB/pipe_slim_spec.json \
  --quant w8a8 --decode --mlir --cpu \
  --batch-size 16 --tsize 320 \
  -o outputs/serving/chainB_int8.stablehlo

# 2) build the native binaries
run_job serve_build timeout 900 make -C serving

# 3) PJRT runner on the v5e (single client — after the probe)
if probe; then
  run_job serve_runner timeout 1800 env \
    AXON_POOL_SVC_OVERRIDE=127.0.0.1 AXON_LOOPBACK_RELAY=1 \
    ./serving/pjrt_runner /opt/axon/libaxon_pjrt.so \
    outputs/serving/chainB_int8.mlir \
    outputs/serving/chainB_int8.compile_options.pb 16 320 320 50

  # 4) batching server under Poisson load: 300 qps for 20 s, 10 ms max
  #    wait, 50 ms SLO
  run_job serve_server timeout 1800 env \
    AXON_POOL_SVC_OVERRIDE=127.0.0.1 AXON_LOOPBACK_RELAY=1 \
    ./serving/pjrt_server /opt/axon/libaxon_pjrt.so \
    outputs/serving/chainB_int8.mlir \
    outputs/serving/chainB_int8.compile_options.pb 16 320 320 300 20 10 50
else
  echo "== TUNNEL DOWN — runner/server skipped" | tee -a outputs/logs/queue.log
fi

echo "== QUEUE R4E COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
