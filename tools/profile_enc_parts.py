import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flashgmm_tpu.ans import interleaved as il
from flashgmm_tpu.ans.gaussian_cdf import gmm_guarded_rows

W = 2048
N = 442368  # batch-6 y pass
T = -(-N // W)
rng = np.random.default_rng(0)
start = jnp.asarray(rng.integers(0, 60000, (T, W)).astype(np.uint32))
freq = jnp.asarray(rng.integers(1, 4000, (T, W)).astype(np.uint32))
active = il.active_mask(N, T, W)

def timeit(f, *a, n=10):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time()-t0)/n*1000

scan_only = jax.jit(lambda s, f, a: il.encode_scan(s, f, a))
print("encode_scan only:", round(timeit(scan_only, start, freq, active), 1), "ms", flush=True)

def scan_pack(s, f, a):
    states, words, emits = il.encode_scan(s, f, a)
    return il.pack_words(words, emits)
sp = jax.jit(scan_pack)
print("scan+pack:", round(timeit(sp, start, freq, active), 1), "ms", flush=True)

# rows + one-hot select cost
K = 4
scales = jnp.asarray(rng.uniform(0.11, 6, (N, K)).astype(np.float32))
means = jnp.asarray(rng.normal(0, 3, (N, K)).astype(np.float32))
w = rng.random((N, K)).astype(np.float32); w /= w.sum(1, keepdims=True)
w = jnp.asarray(w)
sym = jnp.asarray(rng.integers(-40, 40, N).astype(np.int32))

def rows_bounds(sc, me, we, sy):
    rows = gmm_guarded_rows(sc, me, we, jnp.int32(-48), 97, 0)
    L = 98
    jb = sy + 48
    oh = jax.nn.one_hot(jb, L, dtype=jnp.int32)
    st = jnp.sum(rows * oh, axis=1)
    nx = jnp.sum(rows * jax.nn.one_hot(jb + 1, L, dtype=jnp.int32), axis=1)
    return st, nx - st
rb = jax.jit(rows_bounds)
print("rows+onehot bounds:", round(timeit(rb, scales, means, w, sym), 1), "ms", flush=True)

# decode scan cost for comparison
rows = gmm_guarded_rows(scales, means, w, jnp.int32(-48), 97, 0)
rows_l = il.to_lanes(rows, W)
states, words, emits = il.encode_scan(*map(jnp.asarray, (start, freq)), active)
stream, nw = il.pack_words(words, emits)
dec = jax.jit(lambda st, sm, rl, a: il.decode_scan(st, sm, rl, a, jnp.int32(-48)))
print("decode_scan only:", round(timeit(dec, states, stream, rows_l, active), 1), "ms", flush=True)
