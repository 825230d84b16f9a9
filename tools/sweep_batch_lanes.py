"""Sweep the batch codec's lane count x decode backend on the real chip.

Round-3 picked lanes=4096 for bench.py from a SCAN-only sweep (fewer
decode steps). The Pallas decoder has since been probe-measured 6x faster
than the scan at W<=512 — but with more steps (T = n/W grows 8x at
W=512). This sweep measures the actual steady-state batched enc/dec
ms/img for lanes in {512, 1024, 2048, 4096} with the production backend
policy (Pallas decode at W<=512) AND forced-scan, so the encode-side
penalty of small lanes is visible separately.

Run on TPU:  python tools/sweep_batch_lanes.py [--batch 24] [--lanes ...]
Prints one JSON line per configuration.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--n-batches", type=int, default=2)
    ap.add_argument("--lanes", type=int, nargs="*",
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--size", type=int, nargs=2, default=(768, 512))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from flax import nnx

    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime import FastCheckerboardGmmCodec
    from flashgmm_tpu.zoo import load_npz_weights
    from flashgmm_tpu.datasets.synthetic import textured_leaves

    H, W = args.size
    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    load_npz_weights(
        model,
        str(Path(__file__).resolve().parent.parent
            / "weights/ckbd_gmm_n192_k4_synthetic.npz"),
    )
    model.update(update_quantiles=True)

    seed = [520000]

    def make_image():
        seed[0] += 1
        return jnp.asarray(textured_leaves(H, W, seed=seed[0]))

    batches = [
        jax.device_put(jnp.stack([make_image() for _ in range(args.batch)]))
        for _ in range(args.n_batches)
    ]
    n_images = args.batch * args.n_batches

    def measure(lanes, pallas_decode):
        codec = FastCheckerboardGmmCodec(
            model, lanes=lanes, cap_divisor=4, pallas_decode=pallas_decode
        )
        data, out = codec.encode_to_bytes(batches[0])
        y_shape = tuple(out["y_hat"].shape)
        rec = codec.decode_bytes(data, y_shape)
        float(rec[0, 0, 0, 0])  # drain queue (block_until_ready only acks)

        t0 = time.time()
        datas = []
        pending = None
        for b in batches:
            cur = codec.encode(b)
            for p in (cur["z"], cur["y0"], cur["y1"]):
                for a in (p.n_words, p.states, p.stream):
                    a.copy_to_host_async()
            if pending is not None:
                datas.append(codec.to_bytes(pending))
            pending = cur
        datas.append(codec.to_bytes(pending))
        enc_ms = (time.time() - t0) / n_images * 1000

        t0 = time.time()
        recs = [codec.decode_bytes(d, y_shape) for d in datas]
        float(recs[-1][0, 0, 0, 0])
        dec_ms = (time.time() - t0) / n_images * 1000
        bpp = len(datas[0]) / args.batch * 8 / (H * W)
        return enc_ms, dec_ms, bpp

    for lanes in args.lanes:
        # try the Pallas decoder up to 1024 (hier-rank scheme) — beyond
        # that VMEM row blocks get large and the scan has few steps anyway
        for pallas in ([False, True] if lanes <= 1024 else [False]):
            enc_ms, dec_ms, bpp = measure(lanes, pallas)
            print(json.dumps({
                "lanes": lanes,
                "decode_backend": "pallas" if pallas else "scan",
                "enc_ms_per_img": round(enc_ms, 2),
                "dec_ms_per_img": round(dec_ms, 2),
                "total": round(enc_ms + dec_ms, 2),
                "bpp": round(bpp, 4),
                "batch": args.batch,
            }), flush=True)


if __name__ == "__main__":
    main()
