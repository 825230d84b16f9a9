"""Isolate the lanes=512 Pallas desync inside the fused latency program
(VERDICT r3 item 3).

The composable codec runs one pallas_call per XLA program and is proven
bit-exact at every lane count; the fused latency _decode_y program
instantiates the SAME kernel three times (z pass + two y passes) next to
the conv stack — and at lanes=512 returns ~30% wrong symbols. This tool
bisects by backend pattern: it monkeypatches fast_codec._decode_pass
with a per-call-index backend mask, so each of the three in-program
instantiations can be flipped to the XLA scan independently.

  mask bit i == 1  ->  pass i (0=z, 1=y0, 2=y1) uses the Pallas kernel

Usage (TPU): python tools/debug_pallas_fused.py [--lanes 512]
             [--masks 7,1,2,4,6]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
from flax import nnx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=512)
    p.add_argument("--masks", default="7,0,1,2,4,3,6")
    args = p.parse_args()

    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime import FastLatencyGmmCodec
    from flashgmm_tpu.runtime import fast_codec as fc
    from flashgmm_tpu.runtime import latency_codec as lc_mod
    from flashgmm_tpu.datasets.synthetic import textured_leaves
    import bench as B

    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    B._load_bench_weights(model)
    model.update(update_quantiles=True)
    x = jax.device_put(
        jnp.asarray(textured_leaves(768, 512, seed=500001))[None])

    orig_decode_pass = fc._decode_pass
    call_idx = [0]
    mask_holder = [7]

    def patched(ps, rows, n, lo, w, pallas=False):
        i = call_idx[0]
        call_idx[0] += 1
        use_pallas = bool(mask_holder[0] & (1 << i)) and w % 128 == 0
        return orig_decode_pass(ps, rows, n, lo, w, use_pallas)

    # patch in BOTH modules (latency_codec imported the symbol directly)
    fc._decode_pass = patched
    if hasattr(lc_mod, "_decode_pass"):
        lc_mod._decode_pass = patched

    try:
        for mask in [int(m) for m in args.masks.split(",")]:
            mask_holder[0] = mask
            call_idx[0] = 0
            lc = FastLatencyGmmCodec(model, lanes=args.lanes, cap_divisor=4,
                                     pallas_decode=True)
            enc = lc._encode_jit(lc._state, x, lc.cap_divisor)
            ps_z, ps0, ps1, sym0, sym1, y_hat = enc
            y_shape = (x.shape[0], sym0.shape[1], sym0.shape[2] * 2,
                       sym0.shape[3])
            call_idx[0] = 0
            d0, d1, y_dec = lc._decode_y_jit(
                lc._state, (ps_z, ps0, ps1), tuple(y_shape))
            m0 = int(np.sum(np.asarray(d0) != np.asarray(sym0)))
            m1 = int(np.sum(np.asarray(d1) != np.asarray(sym1)))
            my = int(np.sum(np.asarray(y_dec) != np.asarray(y_hat)))
            print(f"mask={mask:03b} (z={mask & 1}, y0={(mask >> 1) & 1}, "
                  f"y1={(mask >> 2) & 1}): sym0_bad={m0} sym1_bad={m1} "
                  f"y_hat_bad={my}", flush=True)
    finally:
        fc._decode_pass = orig_decode_pass
        if hasattr(lc_mod, "_decode_pass"):
            lc_mod._decode_pass = orig_decode_pass


if __name__ == "__main__":
    main()
