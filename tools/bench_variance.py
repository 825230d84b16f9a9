"""Pin down the run-to-run spread of bench.py's headline number
(VERDICT r3 weak item: 18.9/21.8 ms across identical-code runs).

In ONE process: 5 repetitions of the batched steady-state enc+dec
measurement (same protocol as bench.py), interleaved with the
fori_loop-slope DEVICE latency probe of the same fused programs. If the
wall numbers spread while the slope numbers hold still, the variance
lives in the tunnel/host (RTT jitter, host scheduling), not on the chip.

Writes results/synthetic/bench_variance.json.
Usage (TPU): python tools/bench_variance.py [--reps 5]
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--batch", type=int, default=24)
    args = p.parse_args()

    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime import FastCheckerboardGmmCodec
    from flashgmm_tpu.datasets.synthetic import textured_leaves
    import bench as B

    def chain_slope(call, sync, k1=3, k2=12, reps=3):
        """Device ms per call via dispatch-chain slope (pre-compiled
        programs only — no extra fori_loop compile)."""
        def timed(k):
            t0 = time.time()
            for _ in range(reps):
                for _ in range(k):
                    out = call()
                sync(out)
            return (time.time() - t0) / reps * 1e3

        timed(k1)
        t1 = timed(k1)
        t2 = timed(k2)
        return (t2 - t1) / (k2 - k1)

    H, W, BATCH = 768, 512, args.batch
    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    B._load_bench_weights(model)
    model.update(update_quantiles=True)
    codec = FastCheckerboardGmmCodec(model, lanes=4096, cap_divisor=4)

    seed = [500000]

    def make_image():
        seed[0] += 1
        return jnp.asarray(textured_leaves(H, W, seed=seed[0]))

    batches = [
        jax.device_put(jnp.stack([make_image() for _ in range(BATCH)]))
        for _ in range(2)
    ]
    bdata, bout = codec.encode_to_bytes(batches[0])
    by_shape = tuple(bout["y_hat"].shape)
    brec = codec.decode_bytes(bdata, by_shape)
    float(brec[0, 0, 0, 0])

    n_images = BATCH * 2
    walls = []
    for rep in range(args.reps):
        t0 = time.time()
        datas = []
        pending = None
        for b in batches:
            cur = codec.encode(b)
            for ps2 in (cur["z"], cur["y0"], cur["y1"]):
                for a in (ps2.n_words, ps2.states, ps2.stream):
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
        walls.append((enc_ms, dec_ms))
        print(f"rep {rep}: enc {enc_ms:.2f} dec {dec_ms:.2f} "
              f"total {enc_ms + dec_ms:.2f} ms/img", flush=True)

    # device-side slope probes of the same fused stages (RTT-free)
    x1 = batches[0]
    dev_ga = chain_slope(
        lambda: codec._analyze_jit(codec._state, x1, codec.cap_divisor),
        lambda o: float(o[4][0, 0, 0, 0]))
    y = bout["y_hat"]
    dev_gs = chain_slope(
        lambda: codec._gs_jit(codec._state, y),
        lambda o: float(o[0, 0, 0, 0]))
    print(f"device slope: analyze {dev_ga:.2f} ms/batch, g_s {dev_gs:.2f} "
          f"ms/batch ({dev_ga / BATCH:.2f} + {dev_gs / BATCH:.2f} ms/img)",
          flush=True)

    totals = [e + d for e, d in walls]
    out = {
        "reps": args.reps,
        "wall_ms_per_img": [round(t, 2) for t in totals],
        "wall_enc_ms": [round(e, 2) for e, _ in walls],
        "wall_dec_ms": [round(d, 2) for _, d in walls],
        "spread_pct": round(
            (max(totals) - min(totals)) / np.mean(totals) * 100, 1),
        "device_slope_ms_per_batch": {
            "analyze": round(float(dev_ga), 2),
            "g_s": round(float(dev_gs), 2),
        },
        "note": ("wall numbers ride the axon tunnel (27 ms RTT per "
                 "blocking fetch + host scheduling); slope numbers are "
                 "chip-only. Matching slopes across runs with spreading "
                 "walls = environmental variance, not chip variance."),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results/synthetic/bench_variance.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
