"""Differential profiling of the Pallas rANS decode kernel (TPU).

Times the compiled kernel with each pipeline stage ablated
(ans/pallas_coder.py ABLATE switches) to isolate which op is responsible
for the ~100x gap vs interleaved.decode_scan, tries the cumsum-rank
variant (which would lift the W<=512 cap), and compares against the
production scan at the same shapes.

Ablated variants decode GARBAGE (stages are skipped) — only timing is
meaningful; a final all-off run re-asserts bit-exactness.

Usage (TPU): python tools/profile_pallas_variants.py [--lanes 512] [--t 384]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

from flashgmm_tpu.ans import interleaved as il
from flashgmm_tpu.ans import pallas_coder

p = argparse.ArgumentParser()
p.add_argument("--lanes", type=int, default=512)
p.add_argument("--t", type=int, default=384)
p.add_argument("--reps", type=int, default=20)
args = p.parse_args()

W, T = args.lanes, args.t
L = 98
rng = np.random.RandomState(0)

# build a real encoded stream so decode runs realistic data
n = T * W
scales = np.exp(rng.uniform(np.log(0.3), np.log(8.0), n)).astype(np.float32)
symbols = np.clip(np.round(rng.randn(n) * scales), -40, 40).astype(np.int32)
from flashgmm_tpu.ans.gaussian_cdf import gmm_guarded_rows

s = jnp.asarray(scales.reshape(-1, 1))
m_ = jnp.zeros_like(s)
w_ = jnp.ones_like(s)
rows = gmm_guarded_rows(s, m_, w_, jnp.int32(-48), L - 1, 0)
rows = jnp.concatenate(
    [rows.astype(jnp.int32), jnp.full((n, 1), 65536, jnp.int32)], axis=1
)

sym_l = il.to_lanes(jnp.asarray(symbols), W, fill=0)
rows_l = il.to_lanes(rows, W, fill=0)
active = il.active_mask(n, T, W)
L2 = rows_l.shape[-1]
dummy = (jnp.arange(L2, dtype=jnp.int32) * (65536 // (L2 - 1))).clip(0, 65536)
rows_l = jnp.where(active[..., None], rows_l, dummy)

states, stream, n_words = il.encode_scan(sym_l, rows_l, active, jnp.int32(-48))
print(f"W={W} T={T} n={n} words={int(n_words)}", flush=True)


def timeit(f, *a):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(args.reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / args.reps * 1e3, out


# production scan baseline
t_scan, ref = timeit(
    jax.jit(il.decode_scan), states, stream, rows_l, active, jnp.int32(-48)
)
print(f"decode_scan (XLA):          {t_scan:8.2f} ms", flush=True)

VARIANTS = [
    ("pallas full", {}),
    ("  no_search", {"no_search": True}),
    ("  no_lookup", {"no_lookup": True}),
    ("  no_rank", {"no_rank": True}),
    ("  no_window", {"no_window": True}),
    ("  only state update", {"no_search": True, "no_lookup": True,
                             "no_rank": True, "no_window": True}),
    ("pallas rank_cumsum", {"rank_cumsum": True}),
]

for name, switches in VARIANTS:
    for k in pallas_coder.ABLATE:
        pallas_coder.ABLATE[k] = switches.get(k, False)
    try:
        fn = jax.jit(pallas_coder.decode_scan_pallas)
        t_ms, out = timeit(fn, states, stream, rows_l, active, jnp.int32(-48))
        note = ""
        if not any(switches.values()) or switches == {"rank_cumsum": True}:
            ok = bool(jnp.all(out == ref))
            note = "  bit-exact" if ok else "  MISMATCH"
        print(f"{name:26s}  {t_ms:8.2f} ms{note}", flush=True)
    except Exception as e:
        print(f"{name:26s}  FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
for k in pallas_coder.ABLATE:
    pallas_coder.ABLATE[k] = False
