"""Diagnose the lanes=512 latency-codec certification failure seen
2026-08-19 (tools/measure_device_latency.py --lanes 512: primary AND
cross certification fail, fallback digest routing engages).

Hypothesis: the Pallas Mosaic decode kernel desyncs inside the big fused
_decode_y_jit program (z decode + h_s + context + CDF rows + 3 passes)
even though it is bit-exact inside FastCheckerboardGmmCodec's smaller
decode program (r4_exact logs). Test matrix: pallas_decode x {True,
False} at lanes=512; report cert pass/fail and, on failure, which stage
(z / sym0 / sym1) first diverges from the encoder's symbols.

Usage (TPU): python tools/debug_latency_cert512.py [--lanes 512]
"""

import argparse
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
from flax import nnx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=512)
    args = p.parse_args()

    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime import FastLatencyGmmCodec
    from flashgmm_tpu.datasets.synthetic import textured_leaves
    import bench as B

    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    B._load_bench_weights(model)
    model.update(update_quantiles=True)
    x = jax.device_put(
        jnp.asarray(textured_leaves(768, 512, seed=500001))[None])

    for pallas in (True, False):
        lc = FastLatencyGmmCodec(model, lanes=args.lanes, cap_divisor=4,
                                 pallas_decode=pallas)
        enc = lc._encode_jit(lc._state, x, lc.cap_divisor)
        ps_z, ps0, ps1, sym0, sym1, y_hat = enc
        y_shape = (x.shape[0], sym0.shape[1], sym0.shape[2] * 2,
                   sym0.shape[3])
        passes = (ps_z, ps0, ps1)
        layout_ok = lc._streams_match_decode_layout(passes, y_shape)
        d0, d1, y_dec = lc._decode_y_jit(lc._state, passes, tuple(y_shape))
        m0 = int(np.sum(np.asarray(d0) != np.asarray(sym0)))
        m1 = int(np.sum(np.asarray(d1) != np.asarray(sym1)))
        my = int(np.sum(np.asarray(y_dec) != np.asarray(y_hat)))
        print(f"pallas={pallas} lanes={args.lanes}: layout_ok={layout_ok} "
              f"sym0_mismatch={m0}/{np.asarray(sym0).size} "
              f"sym1_mismatch={m1} y_hat_mismatch={my}", flush=True)
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            data, ys = lc.encode_certified(x)
            fellback = any("certification" in str(w.message) for w in wlist)
        print(f"  encode_certified: fallback_warned={fellback} "
              f"bytes={len(data)}", flush=True)


if __name__ == "__main__":
    main()
