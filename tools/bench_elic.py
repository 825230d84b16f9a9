"""ELIC2022GMM on-chip fast-codec timing on TPU.

Loads trained dead-leaves weights when present
(weights/elic_gmm_n192_m320_k4_synthetic.npz) so streams code at a
realistic rate; otherwise random weights (high-entropy upper bound).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.datasets.synthetic import textured_leaves
from flashgmm_tpu.models.elic_gmm import Elic2022GMM
from flashgmm_tpu.runtime import FastElicGmmCodec

H, W = 768, 512
model = Elic2022GMM(N=192, M=320, K=4, rngs=nnx.Rngs(0))

wpath = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "weights/elic_gmm_n192_m320_k4_synthetic.npz")
from flashgmm_tpu.zoo import load_npz_weights

trained = load_npz_weights(model, wpath) > 0
model.update(update_quantiles=True)
codec = FastElicGmmCodec(model, lanes=512)
img = jax.device_put(jnp.asarray(textured_leaves(H, W, seed=500001))[None])


def timeit(f, n=5):
    r = f()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1000


t_enc = timeit(lambda: codec.encode(img))
out = codec.encode(img)
y_shape = tuple(out["y_hat"].shape[1:])
t_dec = timeit(lambda: codec.decode_y_hat(out["streams"], y_shape))
yh = codec.decode_y_hat(out["streams"], y_shape)
ok = bool(jnp.all(yh == out["y_hat"]))
t_full = timeit(lambda: codec.decode(out["streams"], y_shape))
rec = codec.decode(out["streams"], y_shape)
psnr = -10 * np.log10(max(float(jnp.mean((rec - img) ** 2)), 1e-12))
print(
    f"ELIC2022GMM 768x512 on-chip ({'trained' if trained else 'random'} "
    f"weights, dead-leaves): enc {t_enc:.1f} ms, dec_y {t_dec:.1f} ms, "
    f"dec+g_s {t_full:.1f} ms, exact={ok}, "
    f"{codec.num_bytes(out)*8/(H*W):.2f} bpp, {psnr:.1f} dB",
    flush=True,
)

# ---- fused single-program codec: certified bytes + true device latency ----
from flashgmm_tpu.runtime.latency_elic import FastLatencyElicCodec
from flashgmm_tpu.runtime.latency_probe import measure_elic_device_latency

lat = FastLatencyElicCodec(model, lanes=512)
data, y_shape4 = lat.encode_certified(img)
rec2 = lat.decode_bytes(data, y_shape4)
psnr2 = -10 * np.log10(max(float(jnp.mean((rec2 - img) ** 2)), 1e-12))
bpp2 = len(data) * 8 / (H * W)
try:
    dev_enc, dev_dec = measure_elic_device_latency(
        lat, img, lat.from_bytes(data, y_shape4), y_shape4
    )
except Exception as e:  # probe must never mask the functional result
    print(f"latency probe failed: {type(e).__name__}: {e}", flush=True)
    dev_enc = dev_dec = float("nan")
print(
    f"ELIC fused latency codec (lanes=512, certified): device "
    f"enc {dev_enc:.1f} ms + dec {dev_dec:.1f} ms single-image; "
    f"{bpp2:.3f} bpp, {psnr2:.1f} dB",
    flush=True,
)
