"""High-resolution (2K) batched throughput on the flagship codec.

BASELINE config #5 stretch goal: demonstrate 2K-class throughput on one
v5e chip. Same pipelined steady-state measurement as bench.py (encode
fetches stream bytes — a real sync; decode syncs via a scalar fetch from
the last reconstruction), on 2048x1088 dead-leaves content.

Usage (TPU): python tools/bench_highres.py [--batch 4] [--n-batches 2]
Writes results/synthetic/highres_throughput.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
from flax import nnx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=2048)
    p.add_argument("--width", type=int, default=1088)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--n-batches", type=int, default=2)
    p.add_argument("--lanes", type=int, default=4096)
    p.add_argument("--tiled", type=int, default=0, metavar="TILE_H",
                   help="also measure decode with the H-tiled g_s "
                   "(runtime/tiled.py) at this latent tile height")
    args = p.parse_args()

    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime import FastCheckerboardGmmCodec
    from flashgmm_tpu.datasets.synthetic import textured_leaves
    import bench as B

    H, W, BATCH = args.height, args.width, args.batch
    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    trained = B._load_bench_weights(model)
    model.update(update_quantiles=True)
    codec = FastCheckerboardGmmCodec(model, lanes=args.lanes, cap_divisor=4)

    seed = [700000]

    def make_image():
        seed[0] += 1
        return textured_leaves(H, W, seed=seed[0])

    print(f"generating {args.n_batches}x{BATCH} {H}x{W} images...", flush=True)
    batches = [
        jax.device_put(
            jnp.stack([jnp.asarray(make_image()) for _ in range(BATCH)]))
        for _ in range(args.n_batches)
    ]

    print("warm-up (compile)...", flush=True)
    bdata, bout = codec.encode_to_bytes(batches[0])
    by_shape = tuple(bout["y_hat"].shape)
    brec = codec.decode_bytes(bdata, by_shape)
    mse = float(jnp.mean((brec - batches[0]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    float(brec[0, 0, 0, 0])  # warm the sync slice + drain queue

    n_images = BATCH * args.n_batches
    t0 = time.time()
    datas = []
    pending = None
    for b in batches:
        cur = codec.encode(b)
        for ps in (cur["z"], cur["y0"], cur["y1"]):
            for a in (ps.n_words, ps.states, ps.stream):
                a.copy_to_host_async()
        if pending is not None:
            datas.append(codec.to_bytes(pending))
        pending = cur
    datas.append(codec.to_bytes(pending))
    enc_ms = (time.time() - t0) / n_images * 1000

    t0 = time.time()
    recs = [codec.decode_bytes(d, by_shape) for d in datas]
    float(recs[-1][0, 0, 0, 0])
    dec_ms = (time.time() - t0) / n_images * 1000

    tiled_ms = None
    if args.tiled:
        from flashgmm_tpu.runtime.tiled import make_tiled_gs

        gs_tiled = make_tiled_gs(codec, tile_h=args.tiled)

        def dec_tiled(d):
            y = codec.decode_y_hat(codec.from_bytes(d, by_shape), by_shape)
            return gs_tiled(y)

        rec_t = dec_tiled(datas[0])  # compile (2 tile shapes max)
        err = float(jnp.max(jnp.abs(rec_t - recs[0])))
        float(rec_t[0, 0, 0, 0])
        t0 = time.time()
        recs_t = [dec_tiled(d) for d in datas]
        float(recs_t[-1][0, 0, 0, 0])
        tiled_ms = (time.time() - t0) / n_images * 1000
        print(f"tiled decode (tile_h={args.tiled}): {tiled_ms:.1f} ms/img "
              f"(untiled {dec_ms:.1f}); max |diff| vs untiled {err:.2e}",
              flush=True)

    nbytes = len(datas[0]) / BATCH
    bpp = nbytes * 8 / (H * W)
    mpx_s = H * W * 1e-6 / ((enc_ms + dec_ms) / 1e3)
    out = {
        "config": f"{H}x{W} batch={BATCH} lanes={args.lanes} "
                  f"{'trained' if trained else 'random'} weights",
        "enc_ms_per_img": round(enc_ms, 2),
        "dec_ms_per_img": round(dec_ms, 2),
        "bpp": round(bpp, 4),
        "psnr_rgb": round(psnr, 2),
        "megapixels_per_second_encdec": round(mpx_s, 1),
    }
    if tiled_ms is not None:
        out["dec_ms_per_img_tiled"] = round(tiled_ms, 2)
        out["tile_h"] = args.tiled
    print(json.dumps(out), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results/synthetic/highres_throughput.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
