import time, numpy as np, jax, jax.numpy as jnp
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
print("trivial:", timeit(trivial, state, img), "ms")

g_a = jax.jit(lambda s, x: nnx.merge(graphdef, s).g_a(x))
print("g_a f32 default:", timeit(g_a, state, img), "ms")

with jax.default_matmul_precision("bfloat16"):
    g_a_bf = jax.jit(lambda s, x: nnx.merge(graphdef, s).g_a(x))
    print("g_a bf16 matmul-precision:", timeit(g_a_bf, state, img), "ms")

state_bf = jax.tree.map(lambda v: v.astype(jnp.bfloat16) if hasattr(v,'dtype') and v.dtype==jnp.float32 else v, state)
g_a_cast = jax.jit(lambda s, x: nnx.merge(graphdef, s).g_a(x))
print("g_a bf16 params+input:", timeit(g_a_cast, state_bf, img.astype(jnp.bfloat16)), "ms")

# single biggest layer with n=20 to check per-layer claim
layer0 = jax.jit(lambda s, x: nnx.merge(graphdef, s).g_a.layers[0](x))
print("layer0 n=20:", timeit(layer0, state, img, n=20), "ms")
l0out = layer0(state, img)
layer1 = jax.jit(lambda s, x: nnx.merge(graphdef, s).g_a.layers[1](x))
print("layer1 n=20:", timeit(layer1, state, l0out, n=20), "ms")
