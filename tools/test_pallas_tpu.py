"""Compiled-Mosaic bit-exactness check for the Pallas rANS decoder.

Run on the axon TPU: python tools/test_pallas_tpu.py
Verifies decode_scan_pallas == interleaved.decode_scan on real encoder
round-trips at W=256 and W=512.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

from flashgmm_tpu.ans import interleaved as il
from flashgmm_tpu.ans.pallas_coder import decode_scan_pallas


def make(W, T, L=98, seed=0):
    rng = np.random.RandomState(seed)
    n = W * T
    rows1 = np.minimum(np.arange(L) * (65536 // L), 65536).astype(np.int32)
    rows1[-1] = 65536
    rows = np.tile(rows1, (n, 1))
    sym = rng.randint(0, L - 1, n).astype(np.int32)
    start = rows[np.arange(n), sym].astype(np.uint32)
    fr = (rows[np.arange(n), sym + 1] - rows[np.arange(n), sym]).astype(np.uint32)
    active = il.active_mask(n, T, W)
    states, words, emits = il.encode_scan(
        il.to_lanes(jnp.asarray(start), W), il.to_lanes(jnp.asarray(fr), W),
        active,
    )
    stream, _ = il.pack_words(words, emits)
    return states, stream, il.to_lanes(jnp.asarray(rows), W), active


def main():
    fails = 0
    for W, T in ((256, 64), (512, 512)):
        states, stream, rows_l, active = make(W, T)
        out = np.asarray(
            decode_scan_pallas(states, stream, rows_l, active, jnp.int32(0))
        )
        ref = np.asarray(
            il.decode_scan(states, stream, rows_l, active, jnp.int32(0))
        )
        ok = np.array_equal(out, ref)
        print(f"W={W} T={T}: compiled-pallas == scan: {ok}", flush=True)
        fails += not ok
    if fails:
        print("FAILED")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
