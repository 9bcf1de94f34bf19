#!/bin/bash
# CPU accuracy queue for the round-4 chain artifacts: int8 PTQ with
# per-tensor vs per-channel activation scales, plus robustness tables.
# CPU-forced throughout (--cpu), so it can run alongside TPU jobs.
#
# Usage: bash tools/acc_queue_r4.sh outputs/r4_chain [depth width]
set -u
cd /root/repo
CHAIN="${1:-outputs/r4_chain}"
DEPTH="${2:-0.33}"
WIDTH="${3:-0.25}"
DATA=/tmp/cocodet_synth_coco
SLIM="${CHAIN}/pipe_slim_ckpt.msgpack"
SPEC="${CHAIN}/pipe_slim_spec.json"
LOGD="${CHAIN}/acc"
mkdir -p "${LOGD}"

if [ ! -f "${SLIM}" ]; then
  echo "missing ${SLIM} — chain not finished?"; exit 2
fi

run() {
  local name="$1"; shift
  echo "== ${name}: start $(date -u +%H:%M:%S)"
  "$@" > "${LOGD}/${name}.log" 2>&1
  echo "== ${name}: rc=$? end $(date -u +%H:%M:%S)"
}

# int8 PTQ artifacts: per-tensor (round-3 recipe) and per-channel act scales
run quant_tensor python tools/quantize_model.py --cpu \
  -c "${SLIM}" --slim-spec "${SPEC}" --depth "${DEPTH}" --width "${WIDTH}" \
  --synth --img-size 320 -o "${LOGD}/int8_tensor.msgpack"
run quant_channel python tools/quantize_model.py --cpu \
  -c "${SLIM}" --slim-spec "${SPEC}" --depth "${DEPTH}" --width "${WIDTH}" \
  --synth --img-size 320 --act-scales channel \
  -o "${LOGD}/int8_channel.msgpack"

# self-eval AP: bf16 slim baseline + both int8 variants
run eval_bf16 python tools/eval_harness_ckpt.py --cpu \
  -c "${SLIM}" --slim-spec "${SPEC}" --depth "${DEPTH}" --width "${WIDTH}" \
  --data-dir "${DATA}" --img-size 320 -o "${LOGD}/eval_bf16.json"
run eval_int8_tensor python tools/eval_harness_ckpt.py --cpu \
  -c "${LOGD}/int8_tensor.msgpack" --slim-spec "${SPEC}" \
  --depth "${DEPTH}" --width "${WIDTH}" --quant w8a8 \
  --data-dir "${DATA}" --img-size 320 -o "${LOGD}/eval_int8_tensor.json"
run eval_int8_channel python tools/eval_harness_ckpt.py --cpu \
  -c "${LOGD}/int8_channel.msgpack" --slim-spec "${SPEC}" \
  --depth "${DEPTH}" --width "${WIDTH}" --quant w8a8 \
  --data-dir "${DATA}" --img-size 320 -o "${LOGD}/eval_int8_channel.json"

# robustness table on the slim artifact (deterministic CPU val sets)
run robustness python tools/eval_robustness.py --cpu \
  -c "${SLIM}" --slim-spec "${SPEC}" --depth "${DEPTH}" --width "${WIDTH}" \
  --img-size 320 -o "${LOGD}/robustness.json"

echo "== ACC QUEUE COMPLETE $(date -u)"
for f in "${LOGD}"/eval_*.json "${LOGD}/robustness.json"; do
  [ -f "$f" ] && echo "--- $f" && cat "$f"
done
