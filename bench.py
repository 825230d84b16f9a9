"""Benchmark: Kodak-size encode+decode on the flagship ckbd-GMM model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

Baseline (reference FlashGMM on RTX 8000 + AVX2, BASELINE.md): total
compress ~55 ms + decompress ~42 ms = 97 ms per 768x512 Kodak image.
``vs_baseline`` is the speedup factor (baseline_ms / ours_ms; >1 = faster).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from flax import nnx

    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2

    BASELINE_MS = 97.0
    H, W = 768, 512

    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    model.update(update_quantiles=True)

    rs = np.random.RandomState(0)
    # smooth synthetic image (random noise would push every symbol to bypass)
    base = rs.rand(H // 16, W // 16, 3).astype(np.float32)
    img = jax.image.resize(jnp.asarray(base), (H, W, 3), "bilinear")[None]
    img = jnp.clip(img, 0.0, 1.0)

    encode, decode = _make_pipeline(model)

    # warm-up (compiles)
    out = encode(img)
    rec = decode(out)
    np.asarray(rec["x_hat"]).shape

    n_iter = 3
    t0 = time.time()
    for _ in range(n_iter):
        out = encode(img)
    enc_ms = (time.time() - t0) / n_iter * 1000

    t0 = time.time()
    for _ in range(n_iter):
        rec = decode(out)
        rec["x_hat"].block_until_ready()
    dec_ms = (time.time() - t0) / n_iter * 1000

    total = enc_ms + dec_ms
    nbytes = _num_bytes(out["strings"])
    result = {
        "metric": (
            "kodak 768x512 enc+dec ms/image, ckbd-GMM N=192 K=4 "
            f"(enc {enc_ms:.1f} + dec {dec_ms:.1f}; {nbytes * 8 / (H * W):.3f} bpp)"
        ),
        "value": round(total, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / total, 3),
    }
    print(json.dumps(result))


def _make_pipeline(model):
    """On-device fast codec: one jit for encode, one for decode; only
    bitstream words cross the host boundary."""
    from flashgmm_tpu.runtime import FastCheckerboardGmmCodec

    codec = FastCheckerboardGmmCodec(model, lanes=128)
    y_shape_holder = {}

    def encode(x):
        out = codec.encode(x)
        y_shape_holder["y"] = tuple(out["y_hat"].shape[1:])
        # serialize: fetch streams to host (the real product of encoding)
        data = codec.to_bytes(out)
        return {"data": data, "strings": [data]}

    def decode(out):
        streams = codec.from_bytes(out["data"], y_shape_holder["y"])
        return {"x_hat": codec.decode(streams, y_shape_holder["y"])}

    return encode, decode


def _num_bytes(strings):
    n = 0
    for s in strings:
        if isinstance(s, (tuple, list)):
            for e in s:
                if isinstance(e, bytes):
                    n += len(e)
                elif isinstance(e, (tuple, list)):
                    n += sum(len(b) for b in e if isinstance(b, bytes))
        elif isinstance(s, bytes):
            n += len(s)
    return n


if __name__ == "__main__":
    sys.exit(main())
