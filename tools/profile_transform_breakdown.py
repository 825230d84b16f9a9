"""True device-latency breakdown of the flagship transforms (slope probe).

Measures g_a / h_a / h_s / g_s and ablations (GDN->identity, f32 vs
bf16) with the K-slope method (runtime/latency_probe.py), which is immune
to the axon tunnel's 27 ms RTT and its ack-only block_until_ready.

Usage (TPU): python tools/profile_transform_breakdown.py [--batch 1]
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
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--stages", action="store_true",
                   help="also probe cumulative g_s prefixes (16 compiles)")
    p.add_argument("--f32", action="store_true",
                   help="also probe f32 variants")
    args = p.parse_args()

    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime.fast_codec import apply_transform
    from flashgmm_tpu.runtime.latency_probe import measure_fn_latency
    import bench as B

    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    B._load_bench_weights(model)
    b = args.batch
    x = jnp.zeros((b, 768, 512, 3), jnp.float32)
    y = jnp.zeros((b, 48, 32, 192), jnp.float32)
    z = jnp.zeros((b, 12, 8, 192), jnp.float32)

    def probe(name, mod, inp, bf16):
        ms = measure_fn_latency(lambda v: apply_transform(mod, v, bf16), inp)
        print(f"{name:26s} {ms:7.2f} ms  ({ms/b:6.2f} ms/img)", flush=True)

    hyper = model.latent_codec["hyper"]
    modes = (True, False) if args.f32 else (True,)
    for bf16 in modes:
        tag = "bf16" if bf16 else "f32"
        probe(f"g_a {tag}", model.g_a, x, bf16)
        probe(f"g_s {tag}", model.g_s, y, bf16)
    probe("h_a bf16", hyper.h_a, y, True)
    probe("h_s bf16", hyper.h_s, z, True)

    # GDN -> identity ablation (timing only; numerics are wrong on purpose)
    from flashgmm_tpu.layers import gdn as gdn_mod

    orig = gdn_mod.GDN.__call__
    try:
        gdn_mod.GDN.__call__ = lambda self, v: v
        probe("g_a bf16 (GDN=identity)", model.g_a, x, True)
        probe("g_s bf16 (GDN=identity)", model.g_s, y, True)
    finally:
        gdn_mod.GDN.__call__ = orig

    if not args.stages:
        return

    # per-stage g_s: cumulative prefixes of the sequential children
    from flashgmm_tpu.layers.layers import Sequential

    layers = list(model.g_s.layers)
    for i in range(1, len(layers) + 1):
        seq = Sequential(*layers[:i])
        ms = measure_fn_latency(
            lambda v: apply_transform(seq, v, True), y)
        print(f"g_s prefix [:{i:2d}] ({type(layers[i-1]).__name__:24s})"
              f" {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
