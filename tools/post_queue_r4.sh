#!/bin/bash
# Post-training-queue evaluation runbook for round 4. Run AFTER
# tools/train_queue_r4.sh completes (one TPU process at a time). Each
# stage is independent; rerun a failed stage by hand.
#
# Usage: tools/post_queue_r4.sh [stage...]   (default: all)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/post_q4
mkdir -p "$LOG"
stages="${*:-rd vbr video highres mfu}"

run() { # name cmd...
    local name="$1"; shift
    echo "[post] START $name $(date)" | tee -a "$LOG/post.log"
    timeout 3000 "$@" > "$LOG/$name.log" 2>&1
    echo "[post] DONE  $name rc=$? $(date)" | tee -a "$LOG/post.log"
    sleep 60
}

for s in $stages; do
    case "$s" in
    rd)
        run rd_ckbd_q6 python tools/eval_bench_rd.py \
            --weights weights/ckbd_gmm_n192_k4_q6.npz --lmbda 0.013 --quality 6
        run rd_ckbd_q3 python tools/eval_bench_rd.py \
            --weights weights/ckbd_gmm_n192_k4_q3.npz --lmbda 0.001
        run rd_elic_q4 python tools/eval_bench_rd.py --arch elic --lanes 128 \
            --weights weights/elic_gmm_n192_m320_k4_q4.npz --lmbda 0.0025 --quality 4
        run rd_elic_q6 python tools/eval_bench_rd.py --arch elic --lanes 128 \
            --weights weights/elic_gmm_n192_m320_k4_q6.npz --lmbda 0.013 --quality 6
        ;;
    vbr)
        run vbr_sweep python tools/vbr_sweep.py --images 2
        ;;
    video)
        run video python tools/train_video_artifact.py --steps 1200
        ;;
    highres)
        run highres python tools/bench_highres.py --tiled 32
        ;;
    mfu)
        run mfu python tools/mfu_analysis.py --batch 24
        ;;
    esac
done
echo "[post] ALL DONE $(date)" | tee -a "$LOG/post.log"
