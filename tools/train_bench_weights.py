"""Train the flagship briefly on synthetic smooth content so the benchmark
runs at a realistic operating rate; save bf16 weights for bench.py."""
import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.parallel import make_train_state
from flashgmm_tpu.parallel.train import data_parallel_train_step

model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
opt_net, opt_aux = make_train_state(model, 1e-4, 1e-3)

rs = np.random.RandomState(1)
def make_batch(bs=8, hw=256):
    base = rs.rand(bs, hw // 16, hw // 16, 3).astype(np.float32)
    img = jax.image.resize(jnp.asarray(base), (bs, hw, hw, 3), "bilinear")
    return jnp.clip(0.5 + 0.25 * (img - 0.5), 0, 1)

key = jax.random.key(0)
t0 = time.time()
x = make_batch()
out = data_parallel_train_step(model, opt_net, opt_aux, x, key, 0.01)
print(f"train step compile: {time.time()-t0:.0f}s loss={float(out['loss']):.2f}", flush=True)

STEPS = 3000
t0 = time.time()
for i in range(STEPS):
    key, sub = jax.random.split(key)
    x = make_batch()
    out = data_parallel_train_step(model, opt_net, opt_aux, x, sub, 0.01)
    if i % 50 == 0:
        print(f"step {i}: loss={float(out['loss']):.3f} bpp={float(out['bpp_loss']):.3f} "
              f"mse={float(out['mse_loss']):.5f} ({(time.time()-t0)/(i+1):.2f}s/step)", flush=True)

print(f"final: loss={float(out['loss']):.3f} bpp={float(out['bpp_loss']):.3f}", flush=True)

# save bf16 params npz
state = nnx.state(model, nnx.Param)
flat = nnx.to_flat_state(state)
arrays = {}
for path, v in flat:
    keyname = "/".join(str(p) for p in path)
    arr = np.asarray(jax.device_get(v.value))
    if arr.dtype == np.float32:
        arr = arr.astype(np.dtype("bfloat16").newbyteorder("=")) if False else arr.astype(np.float16)
    arrays[keyname] = arr
np.savez_compressed("weights/ckbd_gmm_n192_k4_synthetic.npz", **arrays)
import os
print("saved:", os.path.getsize("weights/ckbd_gmm_n192_k4_synthetic.npz")/1e6, "MB", flush=True)
