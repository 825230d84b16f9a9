import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastCheckerboardGmmCodec
from flashgmm_tpu.ans import interleaved as il
from flashgmm_tpu.ans.gaussian_cdf import gmm_guarded_bounds, gmm_guarded_rows

# isolated coder round-trip on TPU at 2048 lanes
rng = np.random.default_rng(0)
n, lo, nb, w = 110592, -16, 33, 2048
scales = jnp.asarray(rng.uniform(0.11, 6.0, (n, 4)).astype(np.float32))
means = jnp.asarray(rng.normal(0, 3, (n, 4)).astype(np.float32))
wts = rng.random((n, 4)).astype(np.float32); wts /= wts.sum(1, keepdims=True)
wts = jnp.asarray(wts)
values = np.clip(np.round(rng.normal(0, 3, n)), lo+1, -lo-1).astype(np.int32)

start, freq = gmm_guarded_bounds(jnp.asarray(values), scales, means, wts, jnp.int32(lo), nb)
t, _ = il.layout(n, w)
states, words, emits = il.encode_scan(il.to_lanes(start, w), il.to_lanes(freq, w), il.active_mask(n, t, w))
stream, n_words = il.pack_words(words, emits)
rows = gmm_guarded_rows(scales, means, wts, jnp.int32(lo), nb)
rows_l = il.to_lanes(rows, w)
dec = il.decode_scan(states, stream, rows_l, il.active_mask(n, t, w), jnp.int32(lo))
out = np.asarray(il.from_lanes(dec, n))
same = out == values
print("coder-only TPU w=2048:", same.all(), (~same).sum(), "of", n, flush=True)
if not same.all():
    bad = np.argwhere(~same).ravel()
    print("first bad idx:", bad[:10], "lane:", bad[:10] % w, "step:", bad[:10] // w)
