"""TPU exactness regression for the fast codec with TRAINED weights.

Guards the two silent-desync hazards found in round 2, which only
reproduce on the real TPU compiler inside the big fused programs (CPU
tests cannot catch them):

1. XLA rematerialization of quantized symbols: z_bin / sym derived from
   bf16 transforms were recomputed per-consumer with different rounding
   (fix: optimization_barrier after quantization, fast_codec/fast_elic).
2. Integer one-hot-sum CDF lookups pattern-matched onto the MXU with bf16
   operands that cannot represent boundaries like 65533 (fix: masked
   max-reduce lookups), and a float-reciprocal divmod whose fused lowering
   lost precision (fix: integer restoring division, ans/interleaved.py).

Run on the axon TPU:  python tools/test_codec_exact_tpu.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
from flax import nnx

from bench import _load_bench_weights
from flashgmm_tpu.datasets.synthetic import textured_leaves
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastCheckerboardGmmCodec


def main():
    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    trained = _load_bench_weights(model)
    model.update(update_quantiles=True)
    print(f"trained weights: {trained} (trained EB tables have the "
          "near-2^16 boundaries that trigger the hazards)")
    codec = FastCheckerboardGmmCodec(model, lanes=2048, cap_divisor=4)

    failures = 0
    for seed in (500001, 500007, 500013, 500019):
        x = jnp.asarray(textured_leaves(768, 512, seed=seed))[None]
        data, enc = codec.encode_to_bytes(x)
        y_shape = tuple(enc["y_hat"].shape[1:])
        y_dec = codec.decode_y_hat(codec.from_bytes(data, y_shape), y_shape)
        ok = np.array_equal(np.asarray(y_dec), np.asarray(enc["y_hat"]))
        print(f"seed {seed}: exact={ok} ({len(data)} bytes)", flush=True)
        failures += not ok

    xb = jnp.stack(
        [jnp.asarray(textured_leaves(768, 512, seed=500100 + i)) for i in range(4)]
    )
    data, enc = codec.encode_to_bytes(xb)
    ysh = tuple(enc["y_hat"].shape)
    y_dec = codec.decode_y_hat(codec.from_bytes(data, ysh), ysh)
    ok = np.array_equal(np.asarray(y_dec), np.asarray(enc["y_hat"]))
    print(f"batch-4: exact={ok}", flush=True)
    failures += not ok

    # lanes=512: the Pallas Mosaic decode kernel is the default backend
    # here (fast_codec._pallas_decode_default) — guard its exactness inside
    # the full fused decode program, not just in isolation
    codec512 = FastCheckerboardGmmCodec(model, lanes=512, cap_divisor=4)
    assert codec512.pallas_decode, "expected Pallas decode at lanes=512 on TPU"
    for seed in (500001, 500007):
        x = jnp.asarray(textured_leaves(768, 512, seed=seed))[None]
        data, enc = codec512.encode_to_bytes(x)
        y_shape = tuple(enc["y_hat"].shape[1:])
        y_dec = codec512.decode_y_hat(codec512.from_bytes(data, y_shape), y_shape)
        ok = np.array_equal(np.asarray(y_dec), np.asarray(enc["y_hat"]))
        print(f"pallas lanes=512 seed {seed}: exact={ok}", flush=True)
        failures += not ok

    # Latency codec: with the Pallas conv backend pinning the whole
    # CDF->rows chain (ops/pallas_conv.py, VERDICT r4 item 2), the fused
    # encode and decode programs must now produce identical rows — so
    # certification must pass direct (no composable fallback), INCLUDING
    # with the Pallas decode kernel at lanes=512 (previously banned:
    # swapping the decode backend perturbed XLA's fusion of the rows
    # pipeline).
    from flashgmm_tpu.runtime import FastLatencyGmmCodec

    for pallas_dec in (False, True):
        lat = FastLatencyGmmCodec(model, lanes=512, cap_divisor=4,
                                  pallas_decode=pallas_dec)
        x = jnp.asarray(textured_leaves(768, 512, seed=500001))[None]
        enc = lat._encode_jit(lat._state, x, lat.cap_divisor)
        ps, y_hat = enc[:3], enc[5]
        ysh = (x.shape[0], y_hat.shape[1], y_hat.shape[2], y_hat.shape[3])
        _, _, y_dec = lat._decode_y_jit(lat._state, ps, ysh)
        ok = bool(lat._cmp_jit(y_dec, y_hat))
        print(f"latency lanes=512 pallas_decode={pallas_dec}: "
              f"certified={ok}", flush=True)
        failures += not ok

    if failures:
        print(f"FAILED: {failures} mismatching round-trips")
        return 1
    print("OK: all round-trips bit-exact")
    return 0


if __name__ == "__main__":
    sys.exit(main())
