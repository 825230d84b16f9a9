import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flashgmm_tpu.ans import interleaved as il
from flashgmm_tpu.ans.gaussian_cdf import gmm_guarded_bounds, gmm_guarded_rows
from flashgmm_tpu.ans.pallas_coder import decode_scan_pallas

rng = np.random.default_rng(0)
n, lo, nb, w = 442368, -48, 97, 512
K = 4
scales = jnp.asarray(rng.uniform(0.11, 6.0, (n, K)).astype(np.float32))
means = jnp.asarray(rng.normal(0, 3, (n, K)).astype(np.float32))
wts = rng.random((n, K)).astype(np.float32); wts /= wts.sum(1, keepdims=True)
wts = jnp.asarray(wts)
values = np.clip(np.round(rng.normal(0, 3, n)), lo+1, -lo-1).astype(np.int32)
start, freq = gmm_guarded_bounds(jnp.asarray(values), scales, means, wts, jnp.int32(lo), nb)
t, _ = il.layout(n, w)
states, words, emits = il.encode_scan(il.to_lanes(start, w), il.to_lanes(freq, w), il.active_mask(n, t, w))
stream, n_words = il.pack_words(words, emits)
rows = gmm_guarded_rows(scales, means, wts, jnp.int32(lo), nb)
rows_l = il.to_lanes(rows, w)
active = il.active_mask(n, t, w)

def timeit(f, *a, n_=10):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n_):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time()-t0)/n_*1000

dec_scan = jax.jit(lambda st, sm, rl, a: il.decode_scan(st, sm, rl, a, jnp.int32(lo)))
t_scan = timeit(dec_scan, states, stream, rows_l, active)
out_scan = np.asarray(dec_scan(states, stream, rows_l, active))

t0 = time.time()
out_p = decode_scan_pallas(states, stream, rows_l, active, jnp.int32(lo))
jax.block_until_ready(out_p)
print(f"pallas compile+run: {time.time()-t0:.1f}s", flush=True)
t_pallas = timeit(decode_scan_pallas, states, stream, rows_l, active, jnp.int32(lo))
out_p = np.asarray(out_p)
ok = (out_p == out_scan).all() and (np.asarray(il.from_lanes(jnp.asarray(out_p), n)) == values).all()
print(f"scan: {t_scan:.2f} ms   pallas: {t_pallas:.2f} ms   exact={ok}", flush=True)
