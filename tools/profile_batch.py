import time, sys, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastCheckerboardGmmCodec

H, W, B = 768, 512, 6
model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
model.update(update_quantiles=True)
rs = np.random.RandomState(0)
imgs = jnp.stack([
    jnp.clip(0.5 + 0.25*(jax.image.resize(jnp.asarray(rs.rand(H//16, W//16, 3).astype(np.float32)), (H, W, 3), "bilinear") - 0.5), 0, 1)
    for _ in range(B)])
imgs = jax.device_put(imgs)

def timeit(f, n=6):
    r = f(); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.time()-t0)/n*1000

for lanes in (int(sys.argv[1]),):
    codec = FastCheckerboardGmmCodec(model, lanes=lanes, cap_divisor=1)
    t_enc = timeit(lambda: codec.encode(imgs))
    out = codec.encode(imgs)
    y_shape = tuple(out["y_hat"].shape)
    t_dec = timeit(lambda: codec.decode_y_hat(out, y_shape))
    yh = codec.decode_y_hat(out, y_shape)
    ok = bool(jnp.all(yh == out["y_hat"]))
    print(f"B={B} lanes={lanes}: enc {t_enc:.1f} ms ({t_enc/B:.1f}/img), dec_y {t_dec:.1f} ms ({t_dec/B:.1f}/img), exact={ok}", flush=True)
