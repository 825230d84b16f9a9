#!/bin/bash
# Round-5 queue, part B (after the mshp_q3 item and the Pallas-conv TPU
# window): remaining arch training trimmed to fit the round budget, then
# every real-codec eval. Same pause mechanism as part A.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/train_q5}"
mkdir -p "$LOGDIR"

pause_gate() {
    while [ -f /tmp/tpu_pause ]; do
        echo "[queue] paused ($(date))" >> "$LOGDIR/queue.log"
        sleep 60
    done
}

run() { # name out extra chunks steps resume0
    local name="$1" out="$2" extra="$3" chunks="$4" steps="$5" resume0="${6:-}"
    pause_gate
    echo "[queue] START $name $(date)" | tee -a "$LOGDIR/queue.log"
    tools/train_watchdog.sh "$out" "$extra" "$chunks" "$steps" "$resume0" \
        > "$LOGDIR/$name.log" 2>&1
    cp /tmp/train_watchdog.log "$LOGDIR/$name.watchdog.log" 2>/dev/null
    echo "[queue] DONE  $name $(date)" | tee -a "$LOGDIR/queue.log"
    sleep 120
}

runcmd() { # name cmd...
    local name="$1"; shift
    pause_gate
    echo "[queue] START $name $(date)" | tee -a "$LOGDIR/queue.log"
    timeout -s KILL 2900 "$@" > "$LOGDIR/$name.log" 2>&1
    local rc=$?
    if [ "$rc" -ne 0 ]; then
        echo "[queue] $name rc=$rc, one retry after gap" | tee -a "$LOGDIR/queue.log"
        sleep 180
        timeout -s KILL 2900 "$@" >> "$LOGDIR/$name.log" 2>&1
    fi
    echo "[queue] DONE  $name $(date)" | tee -a "$LOGDIR/queue.log"
    sleep 120
}

run bmshj_q3 weights/bmshj_hp_n128_m192_synthetic.npz \
    "--arch bmshj --N 128 --M 192 --lmbda 0.0067" 2 4500
run ckbdgc_q3 weights/ckbd_gc_n128_synthetic.npz \
    "--arch ckbd-gc --N 128 --lmbda 0.0067" 2 4500

run mshp_q4 weights/mshp_n128_m192_q4.npz \
    "--arch mshp --N 128 --M 192 --lmbda 0.013 --lr 5e-5" 1 2500 \
    weights/mshp_n128_m192_synthetic.npz
run bmshj_q4 weights/bmshj_hp_n128_m192_q4.npz \
    "--arch bmshj --N 128 --M 192 --lmbda 0.013 --lr 5e-5" 1 2500 \
    weights/bmshj_hp_n128_m192_synthetic.npz
run ckbdgc_q2 weights/ckbd_gc_n128_q2.npz \
    "--arch ckbd-gc --N 128 --lmbda 0.0035 --lr 5e-5" 1 2500 \
    weights/ckbd_gc_n128_synthetic.npz

run ckbd_msssim weights/ckbd_gmm_n192_k4_q5_msssim.npz \
    "--metric ms-ssim --lmbda 8.73 --lr 5e-5" 1 2200 \
    weights/ckbd_gmm_n192_k4_synthetic.npz

run vbr weights/mshp_vbr_n192_m320_synthetic.npz \
    "--arch vbr --lmbda 0.01 --lr 5e-5" 1 4500

runcmd video_lo python tools/train_video_artifact.py --steps 3500 \
    --lmbda 0.01 --resume weights/ssf2020_synthetic.npz \
    --out weights/ssf2020_synthetic.npz
runcmd video_hi python tools/train_video_artifact.py --steps 2500 \
    --lmbda 0.05 --lr 5e-5 --resume weights/ssf2020_synthetic.npz \
    --out weights/ssf2020_q7.npz

runcmd pcc_hrtzxf python tools/train_pointcloud_artifact.py --arch hrtzxf \
    --steps 1200 --bs 8 --num-points 1024

runcmd eval_mshp_q3 python tools/eval_zoo_rd.py --arch mbt2018-mean \
    --N 128 --M 192 --weights weights/mshp_n128_m192_synthetic.npz \
    --lmbda 0.0067 --quality 3
runcmd eval_mshp_q4 python tools/eval_zoo_rd.py --arch mbt2018-mean \
    --N 128 --M 192 --weights weights/mshp_n128_m192_q4.npz \
    --lmbda 0.013 --quality 4
runcmd eval_bmshj_q3 python tools/eval_zoo_rd.py --arch bmshj2018-hyperprior \
    --N 128 --M 192 --weights weights/bmshj_hp_n128_m192_synthetic.npz \
    --lmbda 0.0067 --quality 3
runcmd eval_bmshj_q4 python tools/eval_zoo_rd.py --arch bmshj2018-hyperprior \
    --N 128 --M 192 --weights weights/bmshj_hp_n128_m192_q4.npz \
    --lmbda 0.013 --quality 4
runcmd eval_ckbdgc_q3 python tools/eval_zoo_rd.py \
    --arch cheng2020-anchor-checkerboard --N 128 \
    --weights weights/ckbd_gc_n128_synthetic.npz --lmbda 0.0067 --quality 3
runcmd eval_ckbdgc_q2 python tools/eval_zoo_rd.py \
    --arch cheng2020-anchor-checkerboard --N 128 \
    --weights weights/ckbd_gc_n128_q2.npz --lmbda 0.0035 --quality 2
runcmd eval_msssim python tools/eval_bench_rd.py \
    --weights weights/ckbd_gmm_n192_k4_q5_msssim.npz --lmbda 8.73 \
    --metric ms-ssim --quality 5 \
    --out results/synthetic/flashgmm_tpu-ckbd-gmm-msssim.json
runcmd vbr_sweep python tools/vbr_sweep.py

echo "[queue] ALL DONE $(date)" | tee -a "$LOGDIR/queue.log"
