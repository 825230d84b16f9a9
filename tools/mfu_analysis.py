"""MFU / roofline analysis of the flagship transforms on the v5e.

For each transform (g_a, g_s, h_a, h_s) and for the full decode and
encode programs, reports:
  - analytic conv FLOPs (2*KH*KW*Cin*Cout*Hout*Wout*B; transposed convs
    counted at input resolution x stride^2 upsampling, i.e. as the
    equivalent subpel conv),
  - minimum HBM traffic (params once + each layer's input read + output
    write in bf16), giving the bandwidth-roofline time at 819 GB/s,
  - measured device latency via the K-slope probe (tunnel-RTT-free,
    runtime/latency_probe.py),
  - MFU vs the v5e bf16 peak (197 TFLOP/s) and the roofline verdict.

Writes results/synthetic/mfu.json. Addresses VERDICT r3 item 1 ("no MFU
number exists anywhere in results/").

Usage (TPU): python tools/mfu_analysis.py [--batch 24]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx

PEAK_BF16 = 197e12      # v5e MXU peak, bf16 FLOP/s
PEAK_HBM = 819e9        # v5e HBM bandwidth, B/s


def conv_flops_and_bytes(mod, x_shape):
    """Walk a transform module tree, returning (flops, hbm_bytes, out_shape).

    Counts only conv/dense FLOPs (elementwise ops are free on the MXU
    roofline and fused on the VPU). HBM bytes assume perfect fusion: each
    major layer reads its input once and writes its output once (bf16),
    plus every parameter once.
    """
    from flashgmm_tpu.layers.layers import (
        Conv2d, ConvTranspose2d, Sequential, PixelShuffle,
        ResidualBlock, ResidualBlockUpsample, ResidualBlockWithStride,
        AttentionBlock, LeakyReLU,
    )
    from flashgmm_tpu.layers.gdn import GDN

    flops = 0
    nbytes = 0

    def arr_bytes(shape):
        return int(np.prod(shape)) * 2  # bf16

    def walk(m, shape):
        nonlocal flops, nbytes
        if isinstance(m, Sequential):
            for child in m.layers:
                shape = walk(child, shape)
            return shape
        if isinstance(m, Conv2d):
            b, h, w, cin = shape
            s = m.stride[0]
            kh, kw, _, cout = m.kernel.value.shape
            ho, wo = h // s, w // s
            flops += 2 * kh * kw * cin * cout * ho * wo * b
            out = (b, ho, wo, cout)
            nbytes += arr_bytes(shape) + arr_bytes(out) \
                + kh * kw * cin * cout * 2
            return out
        if isinstance(m, ConvTranspose2d):
            b, h, w, cin = shape
            s = m.stride[0]
            kh, kw, _, cout = m.kernel.value.shape
            ho, wo = h * s, w * s
            # input-dilated conv: only 1/s^2 of taps hit real samples
            flops += 2 * kh * kw * cin * cout * ho * wo * b // (s * s)
            out = (b, ho, wo, cout)
            nbytes += arr_bytes(shape) + arr_bytes(out) \
                + kh * kw * cin * cout * 2
            return out
        if isinstance(m, PixelShuffle):
            b, h, w, c = shape
            r = m.r
            return (b, h * r, w * r, c // (r * r))
        if isinstance(m, GDN):
            b, h, w, c = shape
            # 1x1 conv over x^2 + rsqrt; counted as a 1x1 conv
            flops += 2 * c * c * h * w * b
            nbytes += arr_bytes(shape) + arr_bytes(shape) + c * c * 2
            return shape
        if isinstance(m, (ResidualBlock, ResidualBlockUpsample,
                          ResidualBlockWithStride, AttentionBlock)):
            # walk declared children in call order via their own __dict__
            out = shape
            for name, child in vars(m).items():
                if isinstance(child, (Conv2d, ConvTranspose2d, Sequential,
                                      GDN, PixelShuffle)):
                    if name in ("skip", "upsample", "downsample"):
                        walk(child, shape)  # parallel branch off the input
                    else:
                        out = walk(child, out)
            return out
        if isinstance(m, LeakyReLU):
            return shape
        # unknown leaf (activations etc.): shape-preserving, free
        return shape

    out_shape = walk(mod, x_shape)
    return flops, nbytes, out_shape


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--out", default="results/synthetic/mfu.json")
    p.add_argument("--skip-subpel-check", action="store_true")
    args = p.parse_args()

    import time

    import jax

    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime.fast_codec import apply_transform
    import bench as B

    def measure_dispatch_chain(fn, x, k1=4, k2=24, reps=3):
        """Device ms per fn(x) via the dispatch-chain slope.

        Dispatches k independent calls (they execute serially in dispatch
        order on the device queue) and fetches one scalar from the LAST
        output — the only sync that provably waits on axon. The (k2-k1)
        slope cancels the ~27 ms tunnel RTT and the dispatch overhead.
        Cheaper to compile than the fori_loop probe (plain jit of fn; no
        giant loop program) at the cost of k dispatches per sample.
        """
        jfn = jax.jit(fn)

        def timed(k):
            outs = [jfn(x) for _ in range(k)]
            t0 = time.time()
            for _ in range(reps):
                outs = [jfn(x) for _ in range(k)]
                float(jax.tree.leaves(outs[-1])[0][(0,) * 4])
            return (time.time() - t0) / reps * 1e3

        timed(k1)  # warm (compile + cache)
        t1 = timed(k1)
        t2 = timed(k2)
        return (t2 - t1) / (k2 - k1)

    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    B._load_bench_weights(model)
    b = args.batch
    H, W = 768, 512
    x = jnp.zeros((b, H, W, 3), jnp.float32)
    y = jnp.zeros((b, H // 16, W // 16, 192), jnp.float32)
    z = jnp.zeros((b, H // 64, W // 64, 192), jnp.float32)
    hyper = model.latent_codec["hyper"]

    rows = []
    report = {"batch": b, "peak_bf16_flops": PEAK_BF16,
              "peak_hbm_Bps": PEAK_HBM, "transforms": {}}
    for name, mod, inp in (("g_a", model.g_a, x), ("g_s", model.g_s, y),
                           ("h_a", hyper.h_a, y), ("h_s", hyper.h_s, z)):
        fl, by, out_shape = conv_flops_and_bytes(mod, inp.shape)
        ms = measure_dispatch_chain(
            lambda v, m=mod: apply_transform(m, v, True), inp)
        t_mxu = fl / PEAK_BF16 * 1e3
        t_hbm = by / PEAK_HBM * 1e3
        mfu = fl / (ms / 1e3) / PEAK_BF16
        bound = "MXU" if t_mxu > t_hbm else "HBM"
        rows.append((name, fl, by, ms, t_mxu, t_hbm, mfu, bound))
        report["transforms"][name] = {
            "gflops_total": fl / 1e9,
            "gflops_per_img": fl / 1e9 / b,
            "hbm_MB": by / 1e6,
            "measured_ms": ms,
            "measured_ms_per_img": ms / b,
            "mxu_roofline_ms": t_mxu,
            "hbm_roofline_ms": t_hbm,
            "mfu": mfu,
            "bound": bound,
        }
        print(f"{name:5s} {fl/1e9:8.1f} GFLOP {by/1e6:8.1f} MB | "
              f"measured {ms:7.2f} ms ({ms/b:5.2f}/img) | "
              f"roofline MXU {t_mxu:6.2f} HBM {t_hbm:6.2f} ms | "
              f"MFU {mfu*100:5.1f}% ({bound}-bound roofline)", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
