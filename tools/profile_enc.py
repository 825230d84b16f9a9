import time, sys, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastCheckerboardGmmCodec

LANES = 512
H, W = 768, 512
model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
model.update(update_quantiles=True)
codec = FastCheckerboardGmmCodec(model, lanes=LANES)
rs = np.random.RandomState(0)
base = rs.rand(H//16, W//16, 3).astype(np.float32)
img = jax.device_put(np.asarray(jnp.clip(jax.image.resize(jnp.asarray(base), (H, W, 3), "bilinear")[None], 0, 1)))

def timeit(f, n=10):
    r = f(); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.time()-t0)/n*1000

t0 = time.time()
out = codec.encode(img); jax.block_until_ready(out["y_hat"])
print(f"encode compile+run: {time.time()-t0:.1f} s", flush=True)
t_enc = timeit(lambda: codec.encode(img))
print(f"encode: {t_enc:.1f} ms", flush=True)
t0=time.time(); data = codec.to_bytes(out); t1=time.time()
print(f"to_bytes {1000*(t1-t0):.1f} ms ({len(data)}B)", flush=True)
N = 8
t0 = time.time()
outs = [codec.encode(img) for _ in range(N)]
datas = [codec.to_bytes(o) for o in outs]
print(f"pipelined encode+serialize: {(time.time()-t0)/N*1000:.1f} ms/img", flush=True)
