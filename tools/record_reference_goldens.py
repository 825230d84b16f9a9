"""Record golden bitstreams/vectors from the ACTUAL reference C++ coder.

Builds the reference pybind11 extensions (compressai.ans from
/root/reference/compressai/cpp_exts/rans/rans_interface.cpp and
compressai._CXX from cpp_exts/ops/ops.cpp) via torch.utils.cpp_extension in
a scratch dir, runs them on deterministic test vectors, and writes the
outputs under tests/expected/reference/.  These goldens are the
cross-implementation bit-exactness contract (BASELINE.md north star:
"bitstreams bit-identical to the PyTorch/C++ reference") consumed by
tests/test_reference_golden.py.

APPROX_MODE and USE_SIMD are latched in C++ statics on first use
(rans_interface.cpp:99-130), so each (mode, simd) combination runs in its
own subprocess (--worker).

Usage:  python tools/record_reference_goldens.py
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "expected", "reference")
BUILD_DIR = "/tmp/refbuild"
REF = "/root/reference"


def load_reference_modules():
    os.makedirs(BUILD_DIR, exist_ok=True)
    from torch.utils.cpp_extension import load

    ans = load(
        name="ans",
        sources=[f"{REF}/compressai/cpp_exts/rans/rans_interface.cpp"],
        extra_include_paths=[
            f"{REF}/third_party/ryg_rans",
            f"{REF}/compressai/cpp_exts/rans",
        ],
        extra_cflags=["-std=c++17", "-O3", "-march=native"],
        build_directory=BUILD_DIR,
        verbose=False,
    )
    cxx = load(
        name="_CXX",
        sources=[f"{REF}/compressai/cpp_exts/ops/ops.cpp"],
        extra_cflags=["-std=c++17", "-O3", "-march=native"],
        build_directory=BUILD_DIR,
        verbose=False,
    )
    return ans, cxx


# ---------------------------------------------------------------------------
# Deterministic test vectors (shared between recorder and golden tests)
# ---------------------------------------------------------------------------


def pmf_battery():
    """Battery of pmfs for pmf_to_quantized_cdf (list of float32 arrays)."""
    rng = np.random.RandomState(1234)
    pmfs = []
    # random uniform-ish of many lengths
    for n in [1, 2, 3, 5, 17, 64, 100, 255]:
        p = rng.rand(n).astype(np.float32)
        pmfs.append(p / p.sum())
    # peaked gaussians of varying widths over a fixed support
    xs = np.arange(-30, 31, dtype=np.float64)
    for s in [0.05, 0.11, 0.5, 1.0, 4.0, 32.0]:
        p = np.exp(-0.5 * (xs / s) ** 2)
        pmfs.append((p / p.sum()).astype(np.float32))
    # pmfs with exact zeros / tiny bins (frequency-stealing edge cases)
    p = np.zeros(32, np.float32)
    p[3] = 1.0
    pmfs.append(p)
    p = np.full(16, 1e-9, np.float32)
    p[7] = 1.0
    pmfs.append((p / p.sum()).astype(np.float32))
    p = rng.rand(50).astype(np.float32)
    p[::3] = 0.0
    pmfs.append(p / p.sum())
    # unnormalized (sums < 1: tail mass goes to the escape slot)
    p = rng.rand(40).astype(np.float32) * 0.02
    pmfs.append(p)
    return pmfs


def table_vectors():
    """(symbols, indexes, cdfs, cdfs_sizes, offsets) exercising the table
    path including out-of-range bypass escapes in both directions."""
    rng = np.random.RandomState(99)
    n_cdfs = 8
    max_len = 0
    cdf_rows, sizes, offsets = [], [], []
    raw_pmfs = []
    for c in range(n_cdfs):
        width = int(rng.randint(3, 40))
        xs = np.arange(width, dtype=np.float64) - width // 2
        s = float(rng.rand() * 6 + 0.1)
        p = np.exp(-0.5 * (xs / s) ** 2) + 1e-6
        p = (p / (p.sum() * (1 + rng.rand() * 0.2))).astype(np.float32)
        raw_pmfs.append(p)
        sizes.append(width + 2)
        offsets.append(int(-(width // 2)))
        max_len = max(max_len, width + 2)
    # symbols: mostly in-range, some far out of range (bypass)
    n = 5000
    indexes = rng.randint(0, n_cdfs, size=n).astype(np.int32)
    symbols = np.empty(n, np.int32)
    for i in range(n):
        idx = indexes[i]
        width = sizes[idx] - 2
        off = offsets[idx]
        r = rng.rand()
        if r < 0.9:
            symbols[i] = rng.randint(0, width) + off
        elif r < 0.95:
            symbols[i] = off - rng.randint(1, 300)  # below range
        else:
            symbols[i] = off + width + rng.randint(0, 100000)  # way above
    return symbols, indexes, raw_pmfs, np.asarray(sizes, np.int32), np.asarray(
        offsets, np.int32
    )


def gsm_vectors():
    """(symbols, scales) for the table-free single-Gaussian path."""
    rng = np.random.RandomState(7)
    n = 8000
    scales = np.exp(rng.uniform(np.log(0.11), np.log(64.0), n)).astype(np.float32)
    symbols = np.round(rng.randn(n) * scales).astype(np.int32)
    # force some bypass cases: symbols in the far tail (pmf quantizes to 0)
    symbols[::157] = (rng.randint(0, 2, size=symbols[::157].shape) * 2 - 1) * (
        np.abs(symbols[::157]) + 900
    )
    return symbols, scales


def gmm_vectors(K=4):
    """(symbols, scales, means, weights) for the table-free GMM path."""
    rng = np.random.RandomState(21)
    n = 8000
    scales = np.exp(rng.uniform(np.log(0.11), np.log(32.0), (n, K))).astype(
        np.float32
    )
    means = (rng.randn(n, K) * 4).astype(np.float32)
    w = rng.rand(n, K).astype(np.float32) + 0.05
    weights = (w / w.sum(1, keepdims=True)).astype(np.float32)
    mean_of_mix = (weights * means).sum(1)
    std_of_mix = np.sqrt((weights * scales**2).sum(1))
    symbols = np.round(mean_of_mix + rng.randn(n) * std_of_mix).astype(np.int32)
    # tail/bypass cases
    symbols[::311] += 500
    symbols[1::311] -= 500
    return symbols, scales, means, weights


# ---------------------------------------------------------------------------
# Recording
# ---------------------------------------------------------------------------


def record_mode_independent(ans, cxx):
    os.makedirs(OUT_DIR, exist_ok=True)
    # 1. pmf_to_quantized_cdf
    pmfs = pmf_battery()
    cdfs = [
        np.asarray(cxx.pmf_to_quantized_cdf(p.tolist(), 16), np.int32)
        for p in pmfs
    ]
    np.savez(
        os.path.join(OUT_DIR, "pmf_to_quantized_cdf.npz"),
        n=len(pmfs),
        **{f"pmf_{i}": p for i, p in enumerate(pmfs)},
        **{f"cdf_{i}": c for i, c in enumerate(cdfs)},
    )

    # 2. table path: build quantized cdfs from the battery via the reference
    symbols, indexes, raw_pmfs, sizes, offsets = table_vectors()
    # CompressAI convention: append the tail mass as an extra (escape) bin so
    # cdf length == pmf_len + 2 == cdfs_sizes (entropy_models.py:206-214)
    cdf_list = [
        np.asarray(
            cxx.pmf_to_quantized_cdf(
                p.tolist() + [max(1.0 - float(p.sum()), 0.0)], 16
            ),
            np.int32,
        )
        for p in raw_pmfs
    ]
    max_len = max(len(c) for c in cdf_list)
    cdf_mat = np.zeros((len(cdf_list), max_len), np.int32)
    for i, c in enumerate(cdf_list):
        cdf_mat[i, : len(c)] = c

    enc = ans.RansEncoder()
    bs = enc.encode_with_indexes(
        symbols.tolist(),
        indexes.tolist(),
        [c.tolist() for c in cdf_list],
        sizes.tolist(),
        offsets.tolist(),
    )
    dec = ans.RansDecoder()
    rt = np.asarray(
        dec.decode_with_indexes(
            bs,
            indexes.tolist(),
            [c.tolist() for c in cdf_list],
            sizes.tolist(),
            offsets.tolist(),
        ),
        np.int32,
    )
    assert np.array_equal(rt, symbols), "reference table path does not round-trip!"
    np.savez(
        os.path.join(OUT_DIR, "table_path.npz"),
        symbols=symbols,
        indexes=indexes,
        cdfs=cdf_mat,
        cdfs_sizes=sizes,
        offsets=offsets,
        bitstream=np.frombuffer(bs, np.uint8),
    )
    print(f"table path: {len(bs)} bytes, {len(symbols)} symbols")


def record_mode(ans, mode: int, simd: int):
    tag = f"mode{mode}_simd{simd}"
    # GSM
    symbols, scales = gsm_vectors()
    enc = ans.RansEncoder()
    bs = enc.encode_with_indexes(symbols.tolist(), scales.tolist(), 0)
    dec = ans.RansDecoder()
    max_bs = int(np.abs(symbols).max()) + 2
    rt = np.asarray(dec.decode_with_indexes(bs, scales.tolist(), max_bs), np.int32)
    assert np.array_equal(rt, symbols), f"reference GSM {tag} no round-trip"
    np.savez(
        os.path.join(OUT_DIR, f"gsm_{tag}.npz"),
        symbols=symbols,
        scales=scales,
        max_bs_value=np.int32(max_bs),
        bitstream=np.frombuffer(bs, np.uint8),
    )

    # GMM K=4
    import torch

    symbols, sc, me, we = gmm_vectors(4)
    enc = ans.RansEncoder()
    bs = enc.encode_with_indexes_gmm(
        torch.from_numpy(symbols),
        torch.from_numpy(sc),
        torch.from_numpy(me),
        torch.from_numpy(we),
        0,
    )
    max_bs = int(np.abs(symbols).max()) + 2
    dec = ans.RansDecoder()
    rt = (
        dec.decode_with_indexes_gmm(
            bs,
            torch.from_numpy(sc),
            torch.from_numpy(me),
            torch.from_numpy(we),
            max_bs,
        )
        .numpy()
        .astype(np.int32)
    )
    assert np.array_equal(rt, symbols), f"reference GMM {tag} no round-trip"
    np.savez(
        os.path.join(OUT_DIR, f"gmm_k4_{tag}.npz"),
        symbols=symbols,
        scales=sc,
        means=me,
        weights=we,
        max_bs_value=np.int32(max_bs),
        bitstream=np.frombuffer(bs, np.uint8),
    )
    print(f"{tag}: gsm={symbols.shape[0]} syms, gmm bytes={len(bs)}")


def main():
    if "--worker" in sys.argv:
        ans, _ = load_reference_modules()
        mode = int(os.environ["APPROX_MODE"])
        simd = 0 if os.environ.get("USE_SIMD") == "0" else 1
        record_mode(ans, mode, simd)
        return

    ans, cxx = load_reference_modules()
    record_mode_independent(ans, cxx)
    combos = [(0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (2, 1)]
    for mode, simd in combos:
        env = dict(os.environ, APPROX_MODE=str(mode), USE_SIMD=str(simd))
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env,
            check=True,
        )
    manifest = {
        "combos": combos,
        "note": "recorded from the reference C++ exts built from "
        "/root/reference/compressai/cpp_exts (rans_interface.cpp, ops.cpp)",
    }
    with open(os.path.join(OUT_DIR, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print("all goldens recorded to", OUT_DIR)


if __name__ == "__main__":
    main()
