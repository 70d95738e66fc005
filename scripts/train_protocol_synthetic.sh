#!/bin/bash
# Full 10k-iteration DyBluRF protocol, hermetic (no dataset in the image):
# trains the synthetic seesaw-shape scene at the exact protocol shapes
# (512x288, 24 frames, 20k+10k seeds, batch 2, E=9), then runs the
# shipped eval (100-step TTO) and metrics CLIs on the checkpoint.
#
# The axon TPU tunnel drops an RPC ~1/1500 iters and a blocking
# device->host pull then hangs forever (BASELINE.md); the watchdog below
# kills a silent trainer and resumes from train_state_latest.npz
# (--start_checkpoint continues at int(ts.step)+1 with the sampler/rng
# streams fast-forwarded — train/loop.py).
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site scripts/train_protocol_synthetic.sh \
#            [expname] [WxHxF] [extra train args...]
# ITERS env overrides the protocol length (default 10000) — the eval
# step loads point_cloud/iteration_$ITERS, so both must agree.
set -u
EXP=${1:-synthetic/protocol10k}
SIZE=${2:-512x288x24}
ITERS=${ITERS:-10000}
shift 2 2>/dev/null || shift $# 2>/dev/null || true
OUT="output/$EXP"
LOG="$OUT/train.log"
STALL_S=900          # no log line for 15 min => hung RPC, kill + resume
                     # (init prints breadcrumbs, but a growth-event
                     # re-jit through the tunnel can take ~300s and a
                     # first compile ~270s — 600 was killing healthy
                     # inits that skipped the escalation warnings)
MAX_RESTARTS=12
mkdir -p "$OUT"

run_train() {           # $1 = resume checkpoint ("" for fresh)
  local ckpt="$1"; shift
  local resume_args=()
  [ -n "$ckpt" ] && resume_args=(--start_checkpoint "$ckpt")
  stdbuf -oL -eL python -m mobgs_tpu.cli.train --synthetic \
      --synthetic_size "$SIZE" --configs configs/stereo/seesaw.py \
      --iterations "$ITERS" \
      --expname "$EXP" "${resume_args[@]}" "$@" >>"$LOG" 2>&1 &
  echo $! > /tmp/protocol_train.pid
  local pid
  pid=$(cat /tmp/protocol_train.pid)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    local age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt "$STALL_S" ]; then
      echo "[watchdog] no output for ${age}s — killing pid $pid to resume" \
        | tee -a "$LOG"
      kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      return 42
    fi
  done
  wait "$pid"
}

attempt=0
resume=""
while true; do
  attempt=$((attempt + 1))
  echo "=== train attempt $attempt (resume='${resume}') ===" | tee -a "$LOG"
  run_train "$resume" "$@"
  rc=$?
  if [ "$rc" -eq 0 ]; then break; fi
  if [ "$attempt" -ge "$MAX_RESTARTS" ]; then
    echo "[watchdog] giving up after $MAX_RESTARTS attempts (rc=$rc)"
    exit 1
  fi
  if [ -f "$OUT/train_state_latest.npz" ]; then
    resume="$OUT/train_state_latest.npz"
  else
    echo "[watchdog] no checkpoint yet — restarting fresh (rc=$rc)"
  fi
done

# eval + metrics failures must FAIL the protocol run (round-4's
# flagship metrics step errored silently and was never re-run):
# tee swallows exit codes, so check pipefail + the results artifact.
set -o pipefail
echo "=== eval (100-step TTO) ===" | tee -a "$LOG"
python -m mobgs_tpu.cli.eval_cli -m "$OUT" --synthetic \
    --synthetic_size "$SIZE" --iteration "$ITERS" 2>&1 | tee -a "$LOG" \
  || { echo "[protocol] EVAL FAILED" | tee -a "$LOG"; exit 2; }
echo "=== metrics ===" | tee -a "$LOG"
python -m mobgs_tpu.cli.metrics_cli -m "$OUT" 2>&1 | tee -a "$LOG" \
  || { echo "[protocol] METRICS FAILED" | tee -a "$LOG"; exit 3; }
[ -f "$OUT/results.json" ] \
  || { echo "[protocol] results.json missing" | tee -a "$LOG"; exit 4; }
echo "done — curves in $OUT/history.json, metrics in $OUT/results.json"
