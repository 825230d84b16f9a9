import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastCheckerboardGmmCodec

# clean transfer latency
for kb in (1, 32, 128, 512):
    x = jax.device_put(jnp.zeros((kb*512,), jnp.uint16)); x.block_until_ready()
    _ = np.asarray(jax.device_get(x))
    t0=time.time()
    for _ in range(5): _ = np.asarray(jax.device_get(x))
    print(f"D2H {kb:4d} KB: {(time.time()-t0)/5*1000:6.1f} ms", flush=True)
    h = np.zeros((kb*512,), np.uint16)
    d = jax.device_put(h); d.block_until_ready()
    t0=time.time()
    for _ in range(5):
        d = jax.device_put(h); d.block_until_ready()
    print(f"H2D {kb:4d} KB: {(time.time()-t0)/5*1000:6.1f} ms", flush=True)

H, W, LANES = 768, 512, 512
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

out = codec.encode(img)
y_shape = tuple(out["y_hat"].shape[1:])
t0=time.time(); xh = codec.decode(out, y_shape); jax.block_until_ready(xh)
print(f"decode compile+run: {time.time()-t0:.1f} s", flush=True)
print(f"decode: {timeit(lambda: codec.decode(out, y_shape)):.1f} ms", flush=True)
data = codec.to_bytes(out)
t0=time.time(); streams = codec.from_bytes(data, y_shape); jax.block_until_ready(streams["y0"].stream)
print(f"from_bytes+H2D: {(time.time()-t0)*1000:.1f} ms", flush=True)
N=8
t0=time.time()
recs = [codec.decode(codec.from_bytes(data, y_shape), y_shape) for _ in range(N)]
jax.block_until_ready(recs)
print(f"pipelined decode: {(time.time()-t0)/N*1000:.1f} ms/img", flush=True)
