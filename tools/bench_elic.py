import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx
from flashgmm_tpu.models.elic_gmm import Elic2022GMM
from flashgmm_tpu.runtime import FastElicGmmCodec

H, W = 768, 512
model = Elic2022GMM(N=192, M=320, K=4, rngs=nnx.Rngs(0))
model.update(update_quantiles=True)
codec = FastElicGmmCodec(model, lanes=512)
rs = np.random.RandomState(0)
img = jnp.clip(0.5 + 0.25*(jax.image.resize(jnp.asarray(rs.rand(H//16, W//16, 3).astype(np.float32)), (H, W, 3), "bilinear") - 0.5), 0, 1)[None]
img = jax.device_put(img)

def timeit(f, n=5):
    r = f(); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.time()-t0)/n*1000

t_enc = timeit(lambda: codec.encode(img))
out = codec.encode(img)
y_shape = tuple(out["y_hat"].shape[1:])
t_dec = timeit(lambda: codec.decode_y_hat(out["streams"], y_shape))
yh = codec.decode_y_hat(out["streams"], y_shape)
ok = bool(jnp.all(yh == out["y_hat"]))
t_full = timeit(lambda: codec.decode(out["streams"], y_shape))
print(f"ELIC2022GMM 768x512 on-chip: enc {t_enc:.1f} ms, dec_y {t_dec:.1f} ms, dec+g_s {t_full:.1f} ms, exact={ok}, {codec.num_bytes(out)*8/(H*W):.2f} bpp", flush=True)
