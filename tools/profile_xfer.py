import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

# a) computed-array D2H cost by size
import functools
@functools.partial(jax.jit, static_argnums=0)
def make(n):
    return (jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)).astype(jnp.uint16)
for kb in (8, 64, 184, 368):
    n = kb * 512
    x = make(n); x.block_until_ready()
    t0=time.time()
    for _ in range(5):
        y = make(n); y.block_until_ready()
        _ = np.asarray(jax.device_get(y))
    t1 = time.time()
    # subtract compute-only time
    t2=time.time()
    for _ in range(5):
        y = make(n); y.block_until_ready()
    t3=time.time()
    print(f"computed D2H {kb:4d} KB: {((t1-t0)-(t3-t2))/5*1000:6.1f} ms (jit {((t3-t2))/5*1000:.1f})", flush=True)

# b) implicit numpy arg transfer vs device_put
@jax.jit
def consume(a, b):
    return a.sum() + b.sum()
h1 = np.zeros(184*512, np.uint16); h2 = np.zeros(184*512, np.uint16)
r = consume(h1, h2); r.block_until_ready()
t0=time.time()
for _ in range(5):
    r = consume(h1, h2); r.block_until_ready()
print(f"implicit numpy args (2x184KB): {(time.time()-t0)/5*1000:.1f} ms", flush=True)
d1 = jax.device_put(h1); d2 = jax.device_put(h2); jax.block_until_ready((d1,d2))
t0=time.time()
for _ in range(5):
    d1 = jax.device_put(h1); d2 = jax.device_put(h2)
    r = consume(d1, d2); r.block_until_ready()
print(f"explicit device_put (2x184KB): {(time.time()-t0)/5*1000:.1f} ms", flush=True)

# c) async D2H overlap: dispatch next while fetching
xs = [make(184*512 + i) for i in range(4)]
jax.block_until_ready(xs)
t0=time.time()
for i in range(4):
    _ = np.asarray(xs[i])
print(f"4 sequential fetches 184KB: {(time.time()-t0)/4*1000:.1f} ms each", flush=True)
t0=time.time()
futs = [x.copy_to_host_async() for x in xs]
arrs = [np.asarray(x) for x in xs]
print(f"4 async-prefetch fetches: {(time.time()-t0)/4*1000:.1f} ms each", flush=True)
