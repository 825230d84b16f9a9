"""Cross-implementation bit-exactness vs the ACTUAL reference C++ coder.

The goldens under tests/expected/reference/ were recorded by
tools/record_reference_goldens.py from the reference pybind11 extensions
built from /root/reference/compressai/cpp_exts (rans_interface.cpp:334-956,
ops.cpp:40-109).  Every test asserts BOTH directions of the interop
contract (BASELINE.md north star):

  * our encoder produces byte-identical bitstreams, and
  * our decoder exactly decodes reference-produced bitstreams.

GSM/GMM goldens were recorded with USE_SIMD=0 (the reference's scalar f32
path, which our host-math path mirrors op-for-op); the table path and
pmf_to_quantized_cdf are float-free integer contracts.
"""

import os

import numpy as np
import pytest

from flashgmm_tpu.ans import cext
from flashgmm_tpu.ans.pmf_to_cdf import pmf_to_quantized_cdf

DIR = os.path.join(os.path.dirname(__file__), "expected", "reference")

pytestmark = pytest.mark.skipif(
    not cext.available(), reason="native host coder unavailable"
)


def _load(name):
    path = os.path.join(DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not recorded")
    return np.load(path)


def test_pmf_to_quantized_cdf_bit_exact():
    z = _load("pmf_to_quantized_cdf.npz")
    for i in range(int(z["n"])):
        ours = np.asarray(pmf_to_quantized_cdf(z[f"pmf_{i}"], 16), np.int32)
        ref = z[f"cdf_{i}"]
        assert np.array_equal(ours, ref), f"pmf {i}: quantized CDF differs"


def test_table_path_encode_byte_identical():
    t = _load("table_path.npz")
    ours = cext.encode_with_indexes(
        t["symbols"], t["indexes"], t["cdfs"], t["cdfs_sizes"], t["offsets"]
    )
    assert ours == t["bitstream"].tobytes()


def test_table_path_decodes_reference_bitstream():
    t = _load("table_path.npz")
    dec = cext.decode_with_indexes(
        t["bitstream"].tobytes(),
        t["indexes"],
        t["cdfs"],
        t["cdfs_sizes"],
        t["offsets"],
    )
    assert np.array_equal(dec, t["symbols"])


def test_table_path_streaming_decoder_on_reference_bitstream():
    t = _load("table_path.npz")
    sd = cext.StreamingDecoder(
        t["bitstream"].tobytes(), t["cdfs"], t["cdfs_sizes"], t["offsets"]
    )
    # decode in several chunks, as an AR model would
    idx = t["indexes"]
    outs = [sd.decode(idx[:100]), sd.decode(idx[100:101]), sd.decode(idx[101:])]
    sd.close()
    assert np.array_equal(np.concatenate(outs), t["symbols"])


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_gsm_encode_byte_identical(mode):
    g = _load(f"gsm_mode{mode}_simd0.npz")
    ours = cext.encode_gsm_host(g["symbols"], g["scales"], approx_mode=mode)
    assert ours == g["bitstream"].tobytes()


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_gsm_simd_insensitive_and_simd1_golden(mode):
    """The reference's GSM (single-Gaussian, search-based) path emits
    byte-identical streams under USE_SIMD=0 and USE_SIMD=1 (recorded
    goldens agree for every APPROX_MODE) — unlike the GMM path, whose
    SIMD horizontal-add order changes the CDF bits and needs the simd
    flag on our host coder. Assert that insensitivity holds on the
    recordings, and that our single (scalar-order) GSM encoder matches
    the simd=1 recording byte-for-byte too."""
    g0 = _load(f"gsm_mode{mode}_simd0.npz")
    g1 = _load(f"gsm_mode{mode}_simd1.npz")
    assert g0["bitstream"].tobytes() == g1["bitstream"].tobytes()
    ours = cext.encode_gsm_host(g1["symbols"], g1["scales"], approx_mode=mode)
    assert ours == g1["bitstream"].tobytes()


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_gsm_decodes_reference_bitstream(mode):
    g = _load(f"gsm_mode{mode}_simd0.npz")
    dec = cext.decode_gsm_host(
        g["bitstream"].tobytes(),
        g["scales"],
        int(g["max_bs_value"]),
        approx_mode=mode,
    )
    assert np.array_equal(dec, g["symbols"])


@pytest.mark.parametrize("simd", [0, 1])
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_gmm_k4_encode_byte_identical(mode, simd):
    """Both reference CDF paths: scalar (libm exp, sequential sum) and AVX2
    (Cephes exp256_ps, pairwise hadd) — they produce DIFFERENT streams and
    our host coder reproduces each bit-exactly (csrc/rans.cpp simd
    variants; cf. rans_interface.cpp:119-292)."""
    g = _load(f"gmm_k4_mode{mode}_simd{simd}.npz")
    ours = cext.encode_gmm_host(
        g["symbols"], g["scales"], g["means"], g["weights"], approx_mode=mode,
        use_simd=simd,
    )
    assert ours == g["bitstream"].tobytes()


@pytest.mark.parametrize("simd", [0, 1])
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_gmm_k4_decodes_reference_bitstream(mode, simd):
    g = _load(f"gmm_k4_mode{mode}_simd{simd}.npz")
    dec = cext.decode_gmm_host(
        g["bitstream"].tobytes(),
        g["scales"],
        g["means"],
        g["weights"],
        int(g["max_bs_value"]),
        approx_mode=mode,
        use_simd=simd,
    )
    assert np.array_equal(dec, g["symbols"])


def test_debug_mode_rejects_bad_cdf():
    """FLASHGMM_DEBUG=1 makes the host coder validate CDF rows (reference
    equivalent: assert_cdfs, rans_interface.cpp:70-80)."""
    import subprocess
    import sys

    code = (
        "import numpy as np\n"
        "from flashgmm_tpu.ans import cext\n"
        "rows = np.array([[100, 50, 65535]], np.uint16)  # non-monotone\n"
        "try:\n"
        "    cext.encode_rows(np.array([0], np.int32), rows, 0)\n"
        "except ValueError:\n"
        "    print('REJECTED')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=dict(os.environ, FLASHGMM_DEBUG="1", JAX_PLATFORMS="cpu"),
        capture_output=True,
        text=True,
    )
    assert "REJECTED" in out.stdout, out.stderr
