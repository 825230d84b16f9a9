"""Standalone C++ codec (csrc/standalone/, flashgmm_tpu/standalone/).

Covers the SADL-codec-analog pipeline (reference compressai/sadl_codec/):
model-card export, C++ encode/decode round trip, byte-level bitstream
interop between the Python twin and the C++ binaries, channel-activation
skipping, and RDOQ.
"""

import shutil
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest
from flax import nnx

from flashgmm_tpu.models.google import FactorizedPrior, FactorizedPriorReLU
from flashgmm_tpu.standalone import (
    decode_bitstream,
    encode_bitstream,
    export_model_card,
)
from flashgmm_tpu.standalone.format import pack_bitstream, unpack_bitstream

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def binaries():
    if shutil.which("g++") is None:
        pytest.skip("no g++ in environment")
    subprocess.run(
        ["make", "standalone"], cwd=REPO, check=True, capture_output=True
    )
    return REPO / "build" / "fgsc_encode", REPO / "build" / "fgsc_decode"


@pytest.fixture(scope="module")
def tiny_model():
    model = FactorizedPrior(N=32, M=48, rngs=nnx.Rngs(0))
    model.update(update_quantiles=True)
    return model


@pytest.fixture(scope="module")
def card(tiny_model, tmp_path_factory):
    path = tmp_path_factory.mktemp("standalone") / "tiny.fgsam"
    n = export_model_card(tiny_model, str(path))
    assert n == path.stat().st_size > 0
    return path


def _test_image(h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    img = np.cumsum(rng.normal(0, 0.02, (h, w, 3)), axis=1) + 0.5
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _write_ppm(path, img):
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img.tobytes())


def _read_ppm(path):
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = map(int, f.readline().split())
        assert f.readline().strip() == b"255"
        return np.frombuffer(f.read(), np.uint8).reshape(h, w, 3)


def test_pack_unpack_exact(tiny_model):
    rng = np.random.default_rng(1)
    symbols = rng.integers(-5, 6, (3, 4, 48)).astype(np.int32)
    symbols[:, :, 10:20] = 0  # some inactive channels
    data = pack_bitstream(symbols, tiny_model, img_w=64, img_h=48)
    out, w, h = unpack_bitstream(data, tiny_model)
    assert (w, h) == (64, 48)
    np.testing.assert_array_equal(out, symbols)


def test_python_roundtrip_odd_size(tiny_model):
    # 50x70: exercises replicate-padding + crop
    img = _test_image(50, 70, seed=2)
    data = encode_bitstream(tiny_model, img)
    rec = decode_bitstream(tiny_model, data)
    assert rec.shape == (50, 70, 3)
    assert np.all(rec >= 0) and np.all(rec <= 1)


def test_cpp_roundtrip_matches_python(binaries, tiny_model, card, tmp_path):
    enc, dec = binaries
    img = _test_image(seed=3)
    ppm = tmp_path / "in.ppm"
    _write_ppm(ppm, img)

    bs_cpp = tmp_path / "cpp.fgs"
    subprocess.run([enc, card, ppm, bs_cpp], check=True, capture_output=True)
    rec_ppm = tmp_path / "rec.ppm"
    subprocess.run([dec, card, bs_cpp, rec_ppm], check=True, capture_output=True)
    rec_cpp = _read_ppm(rec_ppm)

    # C++ stream decodes in Python to (numerically) the same reconstruction
    rec_py = decode_bitstream(tiny_model, bs_cpp.read_bytes())
    rec_py8 = np.clip(rec_py * 255 + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(rec_cpp.astype(int) - rec_py8.astype(int)).max() <= 1

    # and the Python encoder's stream decodes with the C++ binary
    bs_py = tmp_path / "py.fgs"
    bs_py.write_bytes(encode_bitstream(tiny_model, img))
    rec2_ppm = tmp_path / "rec2.ppm"
    subprocess.run([dec, card, bs_py, rec2_ppm], check=True, capture_output=True)
    rec2 = _read_ppm(rec2_ppm)
    rec2_py = decode_bitstream(tiny_model, bs_py.read_bytes())
    rec2_py8 = np.clip(rec2_py * 255 + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(rec2.astype(int) - rec2_py8.astype(int)).max() <= 1


def test_channel_skip_small_stream(tiny_model):
    # near-constant image -> most channels all-median -> inactive in bitmap
    img = np.full((48, 64, 3), 128, np.uint8)
    data = encode_bitstream(tiny_model, img)
    symbols, _, _ = unpack_bitstream(data, tiny_model)
    nbm = (48 + 7) // 8
    bitmap = np.unpackbits(
        np.frombuffer(data, np.uint8, nbm, 16), bitorder="little"
    )[:48]
    inactive = np.nonzero(bitmap == 0)[0]
    assert np.all(symbols[:, :, inactive] == 0)
    rec = decode_bitstream(tiny_model, data)
    assert rec.shape == (48, 64, 3)


def test_rdoq_runs_and_decodes(binaries, tiny_model, card, tmp_path):
    enc, dec = binaries
    img = _test_image(seed=4)
    ppm = tmp_path / "in.ppm"
    _write_ppm(ppm, img)
    bs = tmp_path / "rdoq.fgs"
    # rate-dominant lambda: RDOQ must adjust symbols and stay decodable
    r = subprocess.run(
        [enc, card, ppm, bs, "1e-7"], check=True, capture_output=True, text=True
    )
    assert "rdoq" in r.stdout
    adjusted = int(r.stdout.split("rdoq(lambda=1e-07): ")[1].split()[0])
    assert adjusted > 0
    rec_ppm = tmp_path / "rec.ppm"
    subprocess.run([dec, card, bs, rec_ppm], check=True, capture_output=True)
    assert _read_ppm(rec_ppm).shape == (48, 64, 3)


def test_relu_variant(binaries, tmp_path):
    enc, dec = binaries
    model = FactorizedPriorReLU(N=32, M=48, rngs=nnx.Rngs(1))
    model.update(update_quantiles=True)
    card = tmp_path / "relu.fgsam"
    export_model_card(model, str(card))
    img = _test_image(seed=5)
    ppm = tmp_path / "in.ppm"
    _write_ppm(ppm, img)
    bs = tmp_path / "bs.fgs"
    subprocess.run([enc, card, ppm, bs], check=True, capture_output=True)
    rec_ppm = tmp_path / "rec.ppm"
    subprocess.run([dec, card, bs, rec_ppm], check=True, capture_output=True)
    rec_py = decode_bitstream(model, bs.read_bytes())
    rec_py8 = np.clip(rec_py * 255 + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(_read_ppm(rec_ppm).astype(int) - rec_py8.astype(int)).max() <= 1


def test_int16_variant(binaries, tmp_path):
    """--int16 quantized inference (net_q16.h): ReLU stacks, recon close
    to the float engine's, falls back gracefully on GDN stacks."""
    enc, dec = binaries
    model = FactorizedPriorReLU(N=32, M=48, rngs=nnx.Rngs(2))
    model.update(update_quantiles=True)
    card = tmp_path / "relu.fgsam"
    export_model_card(model, str(card))
    img = _test_image(seed=7)
    ppm = tmp_path / "in.ppm"
    _write_ppm(ppm, img)

    recs = {}
    for name, flags in (("float", []), ("int16", ["--int16"])):
        bs = tmp_path / f"{name}.fgs"
        r = subprocess.run([enc, *flags, card, ppm, bs], check=True,
                           capture_output=True, text=True)
        assert f"g_a({name})" in r.stdout
        rec = tmp_path / f"{name}.ppm"
        subprocess.run([dec, *flags, card, bs, rec], check=True,
                       capture_output=True)
        recs[name] = _read_ppm(rec).astype(int)
    assert np.abs(recs["float"] - recs["int16"]).mean() < 3.0

    # GDN stack: --int16 falls back to float with a warning, still decodes
    gdn_model = FactorizedPrior(N=32, M=48, rngs=nnx.Rngs(3))
    gdn_model.update(update_quantiles=True)
    gdn_card = tmp_path / "gdn.fgsam"
    export_model_card(gdn_model, str(gdn_card))
    bs = tmp_path / "gdn.fgs"
    r = subprocess.run([enc, "--int16", gdn_card, ppm, bs], check=True,
                       capture_output=True, text=True)
    assert "falling back to float" in r.stderr


def test_header_fields(tiny_model):
    img = _test_image(50, 70, seed=6)
    data = encode_bitstream(tiny_model, img)
    assert data[:8] == b"FGSAB001"
    w, h, m, down, flags = struct.unpack_from("<HHHBB", data, 8)
    assert (w, h, m, down, flags) == (70, 50, 48, 16, 1)


def test_decoder_rejects_garbage(binaries, tiny_model, card, tmp_path):
    """fgsc_decode must fail cleanly (nonzero exit, no crash/hang) on
    corrupt input: bad magic, truncated header, corrupt body length,
    truncated body."""
    _, dec = binaries
    img = _test_image(seed=9)
    ppm = tmp_path / "in.ppm"
    _write_ppm(ppm, img)
    enc, _ = binaries
    good = tmp_path / "good.fgs"
    subprocess.run([enc, card, ppm, good], check=True, capture_output=True)
    blob = bytearray(good.read_bytes())

    cases = {
        "bad_magic": b"XXXXXXXX" + bytes(blob[8:]),
        "trunc_header": bytes(blob[:10]),
        "trunc_body": bytes(blob[: len(blob) // 2]),
        "huge_len": bytes(blob[:16 + (48 + 7) // 8])
        + (0xFFFFFFFF).to_bytes(4, "little") + bytes(blob[-32:]),
        "garbage": bytes(np.random.RandomState(0).bytes(64)),
    }
    for name, data in cases.items():
        bad = tmp_path / f"{name}.fgs"
        bad.write_bytes(data)
        r = subprocess.run(
            [dec, card, bad, tmp_path / "out.ppm"],
            capture_output=True, timeout=60,
        )
        assert r.returncode != 0, name
