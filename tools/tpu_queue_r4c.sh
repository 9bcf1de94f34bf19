#!/bin/bash
# Round-4 TPU queue, stage 3: prune-frontier + robustness science after
# the r4b harvest (ROADMAP "session 3").  Same serialization rules —
# single TPU client, probe 8093 between jobs.
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

# chainD: 28ch/event — bracket the frontier cliff between chainB
# (24ch -> 86.3% params, AP50 0.8827) and chainC (32ch -> 80.4%, 0.8128).
run_job r4_chainD timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage prune --init-from outputs/r4_chain \
  --prune-set prune_channels 28 \
  --out outputs/r4_chainD

# chainC long-tune probe: is the 7-point cliff tune-budget-limited?
# chainC's 15-epoch tune was still rising at the end (0.8053 -> 0.8118
# over the last 3 epochs); rerun the tune stage from chainC's prune ckpt
# with double the epochs.
run_job r4_chainC_t30 timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --start-stage tune --init-from outputs/r4_chainC \
  --tune-set max_epoch 30 \
  --out outputs/r4_chainC_t30

# mixedB: the robustness recipe (train on mixed) at the quality point
# (24ch gentle prune) — chain_mixed used the 40ch default.
run_job r4_mixedB timeout 7200 python tools/run_pipeline.py --synth \
  --synth-epochs 30 --synth-size 320 --synth-images 512 \
  --synth-variant mixed \
  --start-stage prune --init-from outputs/r4_chain_mixed \
  --prune-set prune_channels 24 \
  --out outputs/r4_mixedB

echo "== QUEUE R4C COMPLETE $(date -u)" | tee -a outputs/logs/queue.log
