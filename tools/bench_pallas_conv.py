"""Microbenchmark the hand-tiled Pallas conv vs XLA's conv on the real
g_s/g_a shapes (VERDICT r4 item 1: break the 20 ms plateau).

Measures device ms via the dispatch-chain slope (tunnel-RTT-free, same
method as tools/mfu_analysis.py) and verifies on-chip numerics vs the XLA
bf16 conv. Then times the WHOLE g_s with use_pallas_conv on/off.

Usage (TPU, quiet chip): python tools/bench_pallas_conv.py [--batch 24]
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

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=24)
p.add_argument("--out", default=None)
p.add_argument("--k2", type=int, default=16)
p.add_argument("--skip-gs", action="store_true")
args = p.parse_args()

from flashgmm_tpu.ops.pallas_conv import conv2d_nhwc_pallas, use_pallas_conv

PEAK_BF16 = 197e12


def measure(fn, *xs, k1=3, k2=args.k2, reps=3):
    # chain SCALAR outputs so k dispatches don't hold k full conv outputs
    # in HBM (a 24x384x256x192 bf16 output alone is ~0.9 GB). The full-sum
    # consume costs ~1 ms of HBM read at the biggest shapes — identical
    # for both backends, so the comparison stands.
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a), dtype=jnp.float32))

    def timed(k):
        outs = [jfn(*xs) for _ in range(k)]
        t0 = time.time()
        for _ in range(reps):
            outs = [jfn(*xs) for _ in range(k)]
            float(outs[-1])
        return (time.time() - t0) / reps * 1e3

    timed(k1)
    t1 = timed(k1)
    t2 = timed(k2)
    return (t2 - t1) / (k2 - k1)


results = {"batch": args.batch, "cases": {}}
b = args.batch
CASES = [
    ("rb384", (b, 384, 256, 192), 192, 3),
    ("rb192", (b, 192, 128, 192), 192, 3),
    ("rb96", (b, 96, 64, 192), 192, 3),
    ("subpel192", (b, 192, 128, 192), 1536, 3),
    ("subpel96", (b, 96, 64, 192), 1536, 3),
    ("single_rb384", (1, 384, 256, 192), 192, 3),
]

rs = np.random.RandomState(0)
for name, xshape, co, k in CASES:
    ci = xshape[-1]
    # device-side RNG: a 0.9 GB host->device transfer through the axon
    # tunnel costs ~30-45 s; generate on-chip instead
    key = jax.random.key(hash(name) % (2 ** 31))
    x = jax.jit(lambda kk: jax.random.normal(
        kk, xshape, jnp.bfloat16) * 0.5)(key)
    w = jnp.asarray((rs.randn(k, k, ci, co) * 0.03).astype("float32"))
    bias = jnp.asarray(rs.randn(co).astype("float32"))

    def xla_fn(v, w=w, bias=bias, k=k):
        y = jax.lax.conv_general_dilated(
            v, w.astype(jnp.bfloat16), (1, 1),
            ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(jnp.bfloat16)

    def pl_fn(v, w=w, bias=bias):
        return conv2d_nhwc_pallas(v, w, bias, out_dtype=jnp.bfloat16)

    # numerics on-device (scalar fetches only; both backends accum f32)
    @jax.jit
    def _cmp(v):
        a = xla_fn(v).astype(jnp.float32)
        p1 = pl_fn(v).astype(jnp.float32)
        p2 = pl_fn(v).astype(jnp.float32)
        return (jnp.max(jnp.abs(a - p1)), jnp.max(jnp.abs(a)),
                jnp.all(p1 == p2))

    diff, amax, det_d = _cmp(x)
    rel = float(diff) / max(1e-6, float(amax))
    det = bool(det_d)

    ms_xla = measure(xla_fn, x)
    ms_pl = measure(pl_fn, x)
    n, h, wd, _ = xshape
    flops = 2 * n * h * wd * k * k * ci * co
    mfu_xla = flops / (ms_xla * 1e-3) / PEAK_BF16
    mfu_pl = flops / (ms_pl * 1e-3) / PEAK_BF16
    results["cases"][name] = {
        "shape": list(xshape), "c_out": co, "rel_err": rel,
        "deterministic": det,
        "xla_ms": ms_xla, "pallas_ms": ms_pl,
        "xla_mfu": mfu_xla, "pallas_mfu": mfu_pl,
        "speedup": ms_xla / ms_pl,
    }
    print(f"{name}: XLA {ms_xla:.2f} ms ({mfu_xla:.1%} MFU) | "
          f"Pallas {ms_pl:.2f} ms ({mfu_pl:.1%} MFU) | "
          f"x{ms_xla / ms_pl:.2f} rel_err {rel:.2e} det={det}", flush=True)

if not args.skip_gs:
    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime.fast_codec import apply_transform

    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    y = jnp.zeros((b, 48, 32, 192), jnp.float32)
    xi = jnp.zeros((b, 768, 512, 3), jnp.float32)

    def gs_xla(v):
        return apply_transform(model.g_s, v, True)

    def gs_pl(v):
        with use_pallas_conv():
            return apply_transform(model.g_s, v, True)

    def ga_xla(v):
        return apply_transform(model.g_a, v, True)

    def ga_pl(v):
        with use_pallas_conv():
            return apply_transform(model.g_a, v, True)

    for nm, f_x, f_p, inp in (("g_s", gs_xla, gs_pl, y),
                              ("g_a", ga_xla, ga_pl, xi)):
        ms_x = measure(f_x, inp)
        ms_p = measure(f_p, inp)
        results["cases"][nm] = {"xla_ms": ms_x, "pallas_ms": ms_p,
                                "speedup": ms_x / ms_p,
                                "ms_per_img_xla": ms_x / b,
                                "ms_per_img_pallas": ms_p / b}
        print(f"{nm}: XLA {ms_x:.1f} ms | Pallas {ms_p:.1f} ms | "
              f"x{ms_x / ms_p:.2f} ({ms_p / b:.2f} ms/img)", flush=True)

if args.out:
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print("wrote", args.out)
