#!/bin/bash
# Round-5 TPU tail queue — consolidates r5b/r5c/r5d into ONE value-ordered
# serial queue for the tunnel time left after the chainB_t30 artifact
# lands (the frontier sweep is deferred to the next session: it needs
# ~130 min it does not have, and would only regenerate known numbers
# before being cut off).  Order:
#   1. Training-step A/Bs (VERDICT #3): baseline / bf16-SimOTA-cost /
#      latency-hiding-scheduler / combo @ b128/640 — the decisive data
#      for "372+ img/s or a measurement-backed ceiling writeup".
#   2. Native runner real-image detection on the chainB_t30 w8a8 export
#      (the last unverified leg of the C++ serving path).
#   3. XLA-flag sweep on the inference headline (r5c content).
#   4. Device-trace capture attempts (infer + train programs).
#   5. Per-channel QAT tune on the real chain (VERDICT #7 measured A/B).
# Single-TPU-client rule: waits for the r5 runner process to EXIT (it
# prints QUEUE R5 COMPLETE and quits once chainB_t30 + skip markers are
# processed).
set -u
cd /root/repo
mkdir -p outputs/logs outputs/serving

probe() { timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; }

# the r5 queue now runs under tools/watchdog_r5.sh (wedge-kill +
# relaunch), which prints "watchdog: finished" when the chain work is
# done or retries are exhausted — THAT is the tail's start signal (the
# plain "QUEUE R5 COMPLETE" line can appear after an aborted attempt)
t=0
while ! grep -q "watchdog: finished" outputs/logs/queue.log 2>/dev/null; do
  if [ -f /tmp/watchdog_r5.pid ] && ! kill -0 "$(cat /tmp/watchdog_r5.pid)" 2>/dev/null; then
    echo "== watchdog process gone — tail proceeding" | tee -a outputs/logs/queue.log
    break
  fi
  sleep 60; t=$((t + 60))
  [ "$t" -ge 18000 ] && { echo "r5_tail: gave up waiting"; exit 1; }
done

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

CHAIN=outputs/r5_chainB_t30
[ -d "$CHAIN" ] || CHAIN=outputs/r5_chainB
[ -d "$CHAIN" ] || CHAIN=outputs/r5_chain

# ---- 1. training-step A/Bs (fresh process each; r3 anchor 472 ms) ----
run_job train_base timeout 1800 python tools/bench_train.py -b 128 --size 640 --iters 10
run_job train_bf16cost timeout 1800 python tools/bench_train.py \
  -b 128 --size 640 --iters 10 --simota-bf16
run_job train_lhs timeout 1800 env \
  XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
  python tools/bench_train.py -b 128 --size 640 --iters 10
run_job train_combo timeout 1800 env \
  XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
  python tools/bench_train.py -b 128 --size 640 --iters 10 --simota-bf16

# ---- 2. native runner real-image detection ---------------------------
# export is CPU-forced (cheap); quantize reuses the cpu_queue w8a8 if
# it landed, else quantizes here
if [ ! -e "$CHAIN/acc/w8a8.msgpack" ]; then
  run_job tail_quant timeout 3600 python tools/quantize_model.py --cpu \
    -c "$CHAIN/pipe_slim_ckpt.msgpack" \
    --slim-spec "$CHAIN/pipe_slim_spec.json" \
    --depth 0.33 --width 0.25 --synth --img-size 320 \
    --act-scales channel -o "$CHAIN/acc/w8a8.msgpack"
else
  touch outputs/logs/tail_quant.done
fi
[ -e outputs/logs/tail_quant.done ] && \
run_job tail_export timeout 1800 python tools/export_stablehlo.py \
  -n yolox-m-p6 --depth 0.33 --width 0.25 \
  -c "$CHAIN/acc/w8a8.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --quant w8a8 --decode --mlir --cpu \
  --batch-size 1 --tsize 320 --conf 0.25 \
  -o outputs/serving/r5b_det.stablehlo
run_job tail_scene timeout 1200 python - <<'PY'
import glob, json, os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
img_paths = sorted(glob.glob("/tmp/cocodet_synth_coco/val2017/*"))
assert img_paths, "synthetic val set missing"
import cv2
bgr = cv2.imread(img_paths[0])
rgb = bgr[:, :, ::-1]
h, w = rgb.shape[:2]
os.makedirs("outputs/serving", exist_ok=True)
with open("outputs/serving/scene.ppm", "wb") as f:
    f.write(f"P6\n{w} {h}\n255\n".encode())
    f.write(np.ascontiguousarray(rgb).tobytes())
print(json.dumps({"src": img_paths[0], "h": h, "w": w}))
PY
run_job tail_build timeout 900 make -C serving
[ -e outputs/logs/tail_export.done ] && [ -e outputs/logs/tail_scene.done ] && \
run_job tail_detect timeout 1800 env \
  AXON_POOL_SVC_OVERRIDE=127.0.0.1 AXON_LOOPBACK_RELAY=1 \
  ./serving/pjrt_runner /opt/axon/libaxon_pjrt.so \
  outputs/serving/r5b_det.mlir \
  outputs/serving/r5b_det.compile_options.pb 1 320 320 5 \
  --image outputs/serving/scene.ppm \
  --out outputs/serving/scene_det.ppm --conf 0.25

# ---- 3. XLA-flag sweep on the inference headline ----------------------
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

# ---- 4. device-trace capture attempts ---------------------------------
run_job trace_infer timeout 2400 python tools/profile_trace.py \
  --program infer -b 16 --size 320 --iters 3 -o outputs/trace_infer
run_job trace_train timeout 2400 python tools/profile_trace.py \
  --program step -b 32 --size 320 --iters 3 -o outputs/trace_train

# ---- 5. per-channel QAT on the real chain (VERDICT #7 A/B) ------------
run_job tail_qat timeout 5400 python tools/qat_tune.py \
  -c "$CHAIN/pipe_slim_ckpt.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 --img-size 320 -b 8 --steps 300 \
  --lr 1e-6 --act-scales channel \
  --data-dir /tmp/cocodet_synth_coco \
  -o "$CHAIN/acc/qat_channel.msgpack"
[ -e outputs/logs/tail_qat.done ] && \
run_job tail_qat_eval timeout 7200 python tools/eval_harness_ckpt.py --cpu \
  -c "$CHAIN/acc/qat_channel.msgpack" \
  --slim-spec "$CHAIN/pipe_slim_spec.json" \
  --depth 0.33 --width 0.25 --quant w8a8 \
  --data-dir /tmp/cocodet_synth_coco --img-size 320

echo "== QUEUE R5 TAIL COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
