"""Evaluate the trained flagship with the fast codec on held-out synthetic
images; write a reference-style results JSON."""
import json, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastCheckerboardGmmCodec
from flashgmm_tpu.utils.metrics import ms_ssim, psnr
import bench

H, W = 768, 512
model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
assert bench._load_bench_weights(model)
model.update(update_quantiles=True)
codec = FastCheckerboardGmmCodec(model, lanes=2048, cap_divisor=4)

rs = np.random.RandomState(777)  # held-out seed
res = {"psnr-rgb": [], "ms-ssim-rgb": [], "bpp": []}
for i in range(6):
    base = rs.rand(H//16, W//16, 3).astype(np.float32)
    img = jnp.clip(0.5 + 0.25*(jax.image.resize(jnp.asarray(base), (H, W, 3), "bilinear") - 0.5), 0, 1)[None]
    img = jax.device_put(img)
    data, out = codec.encode_to_bytes(img)
    y_shape = tuple(out["y_hat"].shape[1:])
    x_hat = codec.decode_bytes(data, y_shape)
    res["psnr-rgb"].append(float(psnr(img, x_hat)))
    res["ms-ssim-rgb"].append(float(ms_ssim(img, x_hat)))
    res["bpp"].append(len(data) * 8 / (H * W))

out = {
    "name": "flashgmm_tpu-cheng2020-anchor-checkerboard-gmm",
    "description": ("Fast on-device codec, N=192 K=4, briefly trained on "
                    "synthetic smooth content (held-out seed eval); "
                    "TPU v5e, interleaved-rANS fast format"),
    "results": {k: [float(np.mean(v))] for k, v in res.items()},
}
import os
os.makedirs("results/synthetic", exist_ok=True)
with open("results/synthetic/flashgmm_tpu-ckbd-gmm.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out["results"]))
