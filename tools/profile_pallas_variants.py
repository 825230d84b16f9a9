"""Differential profiling of the Pallas rANS decode kernel (TPU).

Times the compiled kernel with each pipeline stage ablated
(ans/pallas_coder.py ABLATE switches) to isolate which op is responsible
for the ~100x gap vs interleaved.decode_scan, tries the cumsum-rank
variant (which would lift the W<=512 cap), and compares against the
production scan at the same shapes.

Ablated variants decode GARBAGE (stages are skipped) — only timing is
meaningful; the full run asserts bit-exactness.

Timing: scalar-fetch walls minus an inline-measured tunnel RTT
(block_until_ready on axon does not wait for execution — see CLAUDE.md).

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
p.add_argument("--reps", type=int, default=5)
p.add_argument("--ablate", action="store_true",
               help="also time the stage-ablated variants")
args = p.parse_args()

W, T = args.lanes, args.t
L = 98
rng = np.random.RandomState(0)

# random strictly-monotone guarded boundary rows (realistic L)
pmf = rng.gamma(0.3, 1.0, size=(T, W, L - 1)).astype(np.float64)
pmf /= pmf.sum(-1, keepdims=True)
q = np.maximum((pmf * (65536 - (L - 1))).astype(np.int64), 0) + 1
q[..., -1] += 65536 - q.sum(-1)
rows_np = np.zeros((T, W, L), np.int32)
rows_np[..., 1:] = np.cumsum(q, -1)
rows = jnp.asarray(rows_np)

sym = rng.randint(0, L - 1, size=(T, W)).astype(np.int32)
start = np.take_along_axis(rows_np, sym[..., None], -1)[..., 0]
nxt = np.take_along_axis(rows_np, sym[..., None] + 1, -1)[..., 0]
active = jnp.ones((T, W), bool)

states, words, emits = jax.jit(il.encode_scan)(
    jnp.asarray(start.astype(np.uint32)),
    jnp.asarray((nxt - start).astype(np.uint32)), active)
stream, n_words = jax.jit(il.pack_words)(words, emits)
stream = jnp.asarray(np.asarray(stream))
states = jnp.asarray(np.asarray(states))
print(f"W={W} T={T} words={int(n_words)}", flush=True)

def timeit(decode_fn):
    """True device exec time via the K-slope fori_loop method
    (see runtime/latency_probe.py) + the decoded output."""
    out = jax.jit(decode_fn)(states, stream, rows, active, jnp.int32(0))

    @jax.jit
    def run(states0, zero, k):
        def body(i, carry):
            st, acc = carry
            syms = decode_fn(st, stream, rows, active, jnp.int32(0))
            tag = jnp.sum(syms[0, :8])
            st = jnp.where(tag + zero == tag, states0, jnp.uint32(0))
            return st, acc + tag

        _, acc = jax.lax.fori_loop(0, k, body, (states0, jnp.int32(0)))
        return acc

    zero = jnp.int32(0)

    def wall(k):
        _ = int(run(states, zero, jnp.int32(k)))
        t0 = time.time()
        for _ in range(args.reps):
            _ = int(run(states, zero, jnp.int32(k)))
        return (time.time() - t0) / args.reps * 1e3

    t1, t2 = wall(1), wall(5)
    return (t2 - t1) / 4, out


t_scan, ref = timeit(il.decode_scan)
ok = np.array_equal(np.asarray(ref), sym)
print(f"decode_scan (XLA):        {t_scan:9.2f} ms  "
      f"{'bit-exact' if ok else 'MISMATCH'}", flush=True)

VARIANTS = [
    ("pallas full", {}),
]
if args.ablate:
    VARIANTS += [
        ("  no_search", {"no_search": True}),
        ("  no_lookup", {"no_lookup": True}),
        ("  no_rank", {"no_rank": True}),
        ("  no_window", {"no_window": True}),
        ("  only state update", {"no_search": True, "no_lookup": True,
                                 "no_rank": True, "no_window": True}),
    ]

for name, switches in VARIANTS:
    for k in pallas_coder.ABLATE:
        pallas_coder.ABLATE[k] = switches.get(k, False)
    try:
        t_ms, out = timeit(pallas_coder.decode_scan_pallas)
        note = ""
        if not any(switches.values()):
            okv = np.array_equal(np.asarray(out), sym)
            note = "  bit-exact" if okv else "  MISMATCH"
        print(f"{name:26s}{t_ms:9.2f} ms{note}", flush=True)
    except Exception as e:
        print(f"{name:26s}  FAILED: {type(e).__name__}: {str(e)[:140]}",
              flush=True)
for k in pallas_coder.ABLATE:
    pallas_coder.ABLATE[k] = False
