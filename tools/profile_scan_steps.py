"""Microbenchmark: per-step cost of the interleaved rANS scans on TPU.

Times encode_scan / decode_scan standalone (rows precomputed, realistic
L=98 guarded tables) across lane widths and lax.scan unroll factors, to
locate the per-step latency floor that dominates single-image codec
latency (runtime/latency_codec.py).

Usage (TPU): python tools/profile_scan_steps.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

from flashgmm_tpu.ans import interleaved as il

L = 98
N_SYM = 147456 * 2 + 18432  # flagship single-image symbol count (y0+y1+z)


def make_rows(T, W, rng):
    """Random strictly-monotone guarded boundary rows [T, W, L]."""
    pmf = rng.gamma(0.3, 1.0, size=(T, W, L - 1)).astype(np.float64)
    pmf /= pmf.sum(-1, keepdims=True)
    q = np.maximum((pmf * (65536 - (L - 1))).astype(np.int64), 0) + 1
    # fix total to 65536 exactly
    tot = q.sum(-1)
    q[..., -1] += 65536 - tot
    rows = np.zeros((T, W, L), np.int32)
    rows[..., 1:] = np.cumsum(q, -1)
    return rows


def main():
    rng = np.random.RandomState(0)
    reps = 8
    for W in (1024, 2048, 4096):
        T = -(-N_SYM // W)
        rows = jnp.asarray(make_rows(T, W, rng))
        sym = rng.randint(0, L - 1, size=(T, W)).astype(np.int32)
        rows_np = np.asarray(rows)
        start = np.take_along_axis(rows_np, sym[..., None], -1)[..., 0]
        nxt = np.take_along_axis(rows_np, sym[..., None] + 1, -1)[..., 0]
        freqs = jnp.asarray((nxt - start).astype(np.uint32))
        starts = jnp.asarray(start.astype(np.uint32))
        active = jnp.ones((T, W), bool)

        enc = jax.jit(il.encode_scan)
        states, words, emits = enc(starts, freqs, active)
        jax.block_until_ready(states)
        t0 = time.time()
        for _ in range(reps):
            out = enc(starts, freqs, active)
        jax.block_until_ready(out)
        enc_ms = (time.time() - t0) / reps * 1e3

        stream, n_words = jax.jit(il.pack_words)(words, emits)
        stream = jnp.asarray(np.asarray(stream))
        dec = jax.jit(il.decode_scan)
        syms = dec(states, stream, rows, active, jnp.int32(0))
        jax.block_until_ready(syms)
        assert np.array_equal(np.asarray(syms), sym), "roundtrip mismatch"
        t0 = time.time()
        for _ in range(reps):
            out = dec(states, stream, rows, active, jnp.int32(0))
        jax.block_until_ready(out)
        dec_ms = (time.time() - t0) / reps * 1e3

        print(f"W={W:5d} T={T:4d}: enc {enc_ms:7.2f} ms ({enc_ms/T*1e3:6.1f} "
              f"us/step)  dec {dec_ms:7.2f} ms ({dec_ms/T*1e3:6.1f} us/step)",
              flush=True)


if __name__ == "__main__":
    main()
