import time, sys, numpy as np, jax, jax.numpy as jnp
from flax import nnx
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastCheckerboardGmmCodec

LANES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
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

t_enc = timeit(lambda: codec.encode(img))
out = codec.encode(img)
y_shape = tuple(out["y_hat"].shape[1:])
t_dec = timeit(lambda: codec.decode(out, y_shape))
yh = codec.decode_y_hat(out, y_shape)
ok = bool(jnp.all(yh == out["y_hat"]))
print(f"lanes={LANES}: enc {t_enc:.1f} ms, dec {t_dec:.1f} ms, exact={ok}", flush=True)

# serialization costs
t0=time.time(); data = codec.to_bytes(out); t1=time.time()
streams = codec.from_bytes(data, y_shape); jax.block_until_ready(streams["y0"].stream)
t2=time.time()
print(f"to_bytes {1000*(t1-t0):.1f} ms ({len(data)}B), from_bytes {1000*(t2-t1):.1f} ms", flush=True)

# pipelined throughput: issue N encodes then fetch
N = 8
t0 = time.time()
outs = [codec.encode(img) for _ in range(N)]
datas = [codec.to_bytes(o) for o in outs]
t1 = time.time()
print(f"pipelined encode+serialize: {(t1-t0)/N*1000:.1f} ms/img", flush=True)
t0 = time.time()
recs = [codec.decode(codec.from_bytes(d, y_shape), y_shape) for d in datas]
jax.block_until_ready(recs)
t1 = time.time()
print(f"pipelined decode: {(t1-t0)/N*1000:.1f} ms/img", flush=True)
