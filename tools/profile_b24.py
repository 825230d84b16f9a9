"""Stage-level breakdown of the batch-24 bench path on TPU.

Times, per image: on-chip encode, stream fetch (to_bytes), host->device
upload (from_bytes), on-chip y decode, g_s synthesis — to find the next
bottleneck after round 1's 24.3 ms/img.
"""

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

from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastCheckerboardGmmCodec
from bench import _load_bench_weights

H, W, B = 768, 512, 24
model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
print("trained:", _load_bench_weights(model), flush=True)
model.update(update_quantiles=True)
codec = FastCheckerboardGmmCodec(model, lanes=int(sys.argv[1]) if len(sys.argv) > 1 else 2048, cap_divisor=4)

rs = np.random.RandomState(0)


def make_image():
    base = rs.rand(H // 16, W // 16, 3).astype(np.float32)
    img = jax.image.resize(jnp.asarray(base), (H, W, 3), "bilinear")
    return jnp.clip(0.5 + 0.25 * (img - 0.5), 0.0, 1.0)


imgs = jax.device_put(jnp.stack([make_image() for _ in range(B)]))


def timeit(f, n=5):
    r = f()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1000


# on-chip encode only
t_enc = timeit(lambda: codec.encode(imgs))
out = codec.encode(imgs)
by_shape = tuple(out["y_hat"].shape)

# fetch
def fetch():
    for p in (out["z"], out["y0"], out["y1"]):
        for a in (p.n_words, p.states, p.stream):
            a.copy_to_host_async()
    return codec.to_bytes(out)


r = fetch()
t0 = time.time()
for _ in range(5):
    data = fetch()
t_fetch = (time.time() - t0) / 5 * 1000

# full decode_bytes (upload + decode + g_s)
t_decbytes = timeit(lambda: codec.decode_bytes(data, by_shape), n=5)

# on-chip y decode only (no upload): reuse device arrays from encode
t_dec_y = timeit(lambda: codec.decode_y_hat(out, by_shape), n=5)

# g_s alone
y_hat = out["y_hat"]
_gs_model = nnx.merge(codec._graphdef, codec._state)
g_s = jax.jit(lambda y: _gs_model.g_s(y))
t_gs = timeit(lambda: g_s(y_hat), n=5)

print(
    f"B={B} per-image ms: enc_chip {t_enc/B:.2f}  fetch {t_fetch/B:.2f}  "
    f"decode_bytes {t_decbytes/B:.2f} (dec_y_chip {t_dec_y/B:.2f} + g_s {t_gs/B:.2f} "
    f"+ upload {t_decbytes/B - t_dec_y/B - t_gs/B:.2f})",
    flush=True,
)
print(
    f"total pipeline-ideal {t_enc/B + t_fetch/B:.2f} + {t_decbytes/B:.2f} = "
    f"{(t_enc + t_fetch + t_decbytes)/B:.2f} ms/img",
    flush=True,
)
