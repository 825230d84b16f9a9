#!/bin/bash
# Chunked-resume training watchdog for the axon TPU tunnel.
#
# The tunnel wedges under sustained training (~30-45 min): a chunk that
# stops printing probes is SIGKILLed and training resumes from the last
# periodic weight save (fresh optimizer — train_bench_weights.py --resume).
# Keep chunks short enough that a kill loses little progress, and leave
# fully-quiet gaps between chunks so stale grants clear.
#
# Usage:
#   tools/train_watchdog.sh OUT.npz "EXTRA_ARGS" TOTAL_CHUNKS CHUNK_STEPS [RESUME0]
# e.g. second-lambda flagship warm start:
#   tools/train_watchdog.sh weights/ckbd_gmm_n192_k4_q2.npz \
#     "--lmbda 0.0025 --lr 5e-5" 6 2500 weights/ckbd_gmm_n192_k4_synthetic.npz
set -u
OUT="$1"; EXTRA="$2"; CHUNKS="${3:-6}"; STEPS="${4:-2500}"; RESUME0="${5:-}"
CHUNK_TIMEOUT="${CHUNK_TIMEOUT:-2400}"   # hard wall per chunk (s)
GAP="${GAP:-90}"                          # quiet gap between chunks (s)
cd "$(dirname "$0")/.."
LOG=/tmp/train_watchdog.log
: > "$LOG"
for i in $(seq 1 "$CHUNKS"); do
    if [ -f "$OUT" ]; then RESUME="$OUT"; else RESUME="$RESUME0"; fi
    RARG=""
    [ -n "$RESUME" ] && RARG="--resume $RESUME"
    echo "[watchdog] chunk $i/$CHUNKS resume=$RESUME $(date)" | tee -a "$LOG"
    # shellcheck disable=SC2086
    timeout -s KILL "$CHUNK_TIMEOUT" \
        python tools/train_bench_weights.py --steps "$STEPS" \
        --out "$OUT" $RARG $EXTRA >> "$LOG" 2>&1
    rc=$?
    echo "[watchdog] chunk $i exited rc=$rc $(date)" | tee -a "$LOG"
    sleep "$GAP"
done
echo "[watchdog] done $(date)" | tee -a "$LOG"
