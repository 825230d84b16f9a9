import time, functools, numpy as np, jax, jax.numpy as jnp
from flax import nnx
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2

H, W = 768, 512
model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
graphdef, state = nnx.split(model)
img = jnp.zeros((1, H, W, 3), jnp.float32)

def timeit(f, *a, n=10):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time()-t0)/n*1000

trivial = jax.jit(lambda s, x: x + 1.0)
print("trivial:", round(timeit(trivial, state, img),2), "ms", flush=True)

g_a = jax.jit(lambda s, x: nnx.merge(graphdef, s).g_a(x))
print("g_a f32 default:", round(timeit(g_a, state, img),1), "ms", flush=True)

for prec in ("bfloat16", "tensorfloat32", "highest"):
    with jax.default_matmul_precision(prec):
        fn2 = jax.jit(functools.partial(lambda p, s, x: nnx.merge(graphdef, s).g_a(x), prec))
        print(f"g_a {prec}:", round(timeit(fn2, state, img),1), "ms", flush=True)

tot = 0
cur = img
for i in range(7):
    fn = jax.jit(lambda s, x, i=i: nnx.merge(graphdef, s).g_a.layers[i](x))
    t = timeit(fn, state, cur, n=10); tot += t
    cur = fn(state, cur)
print("sum of individual layers:", round(tot,1), "ms", flush=True)
