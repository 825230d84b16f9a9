#!/bin/bash
# Round-4 training queue: new RD-curve lambdas (VERDICT r3 item 2) + a
# VBR model for the 8-gain sweep (item 6). Runs sequentially through
# train_watchdog.sh (chunked resume; survives tunnel wedges). One TPU
# process at a time — do not run anything else on the chip while this is
# live.
#
# Usage: tools/train_queue_r4.sh [queue log dir]
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/train_q4}"
mkdir -p "$LOGDIR"

run() { # name out extra chunks steps resume0
    local name="$1" out="$2" extra="$3" chunks="$4" steps="$5" resume0="${6:-}"
    echo "[queue] START $name $(date)" | tee -a "$LOGDIR/queue.log"
    tools/train_watchdog.sh "$out" "$extra" "$chunks" "$steps" "$resume0" \
        > "$LOGDIR/$name.log" 2>&1
    cp /tmp/train_watchdog.log "$LOGDIR/$name.watchdog.log" 2>/dev/null
    echo "[queue] DONE  $name $(date)" | tee -a "$LOGDIR/queue.log"
    sleep 120   # quiet gap so stale grants clear before the next claim
}

# 1. flagship high-rate point (zoo q6): warm-start from the q5 weights
run ckbd_q6 weights/ckbd_gmm_n192_k4_q6.npz \
    "--lmbda 0.013 --lr 5e-5" 3 2200 weights/ckbd_gmm_n192_k4_synthetic.npz

# 2. flagship low-rate point (zoo q3): warm-start from the q4 (0.0025) run
run ckbd_q3 weights/ckbd_gmm_n192_k4_q3.npz \
    "--lmbda 0.001 --lr 5e-5" 3 2200 weights/ckbd_gmm_n192_k4_q2.npz

# 3. ELIC lower-rate point (zoo q4): warm-start from the ELIC flagship
run elic_q4 weights/elic_gmm_n192_m320_k4_q4.npz \
    "--arch elic --lmbda 0.0025 --lr 5e-5" 3 1800 \
    weights/elic_gmm_n192_m320_k4_synthetic.npz

# 4. ELIC high-rate point (zoo q6): warm-start from the ELIC flagship
run elic_q6 weights/elic_gmm_n192_m320_k4_q6.npz \
    "--arch elic --lmbda 0.013 --lr 5e-5" 3 1800 \
    weights/elic_gmm_n192_m320_k4_synthetic.npz

# 5. VBR MeanScaleHyperprior (one model, 8 gains) from scratch
run vbr weights/mshp_vbr_n192_m320_synthetic.npz \
    "--arch vbr --lmbda 0.01 --lr 1e-4" 3 3000

echo "[queue] ALL DONE $(date)" | tee -a "$LOGDIR/queue.log"
