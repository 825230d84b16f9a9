"""MODEL-LEVEL interop against the actual reference networks (ckbd + ELIC).

Consumes goldens recorded by tools/record_model_interop_goldens.py from the
reference PyTorch ``Cheng2020AnchorCheckerboardGMMv2`` and ``Elic2022GMM``
running their real ``compress()``/``decompress()`` (reference
models/base.py:202-213, entropy_models.py:833-910) through the built
reference C++ coder (USE_SIMD=1, the reference default).

Proven here, on a full-image, full-model container:
  1. checkpoint conversion fidelity at every pipeline stage,
  2. the EB z-branch exchanges byte-identical strings with NO transplanted
     tensors (tables travel in the checkpoint, symbols are screened
     round()-stable; see the recorder's boundary screen),
  3. every per-pass GMM container — (bytes, abs_max, zero_bitmap), symbol
     order, zero-channel skipping — is byte-identical given bitwise-equal
     entropy params (2 checkerboard passes for ckbd; 5 groups x 2 passes
     for ELIC's SCCTX),
  4. the full model-level compress produces the exact same y_hat symbols
     and container metadata end-to-end, and decompressing our own streams
     reconstructs the reference's x_hat.

Full y-branch *byte* equality without transplanted params is impossible
for ANY independent implementation pair (docs/bitstream.md "Model-level
interop"): the reference quantizes CDFs from f32 network outputs, and
torch-CPU vs XLA-CPU convs differ in ulps on ~90% of outputs.  The
measured-divergence test keeps that fact measured, not assumed.
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

EXPECTED = os.path.join(os.path.dirname(__file__), "expected", "reference")


def _golden_path(arch):
    return os.path.join(EXPECTED, f"model_interop_{arch}.npz")


def nhwc(a):
    return np.ascontiguousarray(np.transpose(np.asarray(a), (0, 2, 3, 1)))


def nchw(a):
    return np.ascontiguousarray(np.transpose(np.asarray(a), (0, 3, 1, 2)))


@pytest.fixture(scope="module", params=["ckbd", "elic"])
def arch(request):
    if not os.path.exists(_golden_path(request.param)):
        pytest.skip(f"{request.param} model interop goldens not recorded")
    return request.param


@pytest.fixture(scope="module")
def golden(arch):
    return np.load(_golden_path(arch))


@pytest.fixture(scope="module")
def model(arch, golden):
    from flax import nnx

    from flashgmm_tpu.zoo.torch_convert import load_torch_state_dict

    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("sd/")}
    if arch == "ckbd":
        from flashgmm_tpu.models.ckbd_gmm import (
            Cheng2020AnchorCheckerboardGMMv2,
        )

        m = Cheng2020AnchorCheckerboardGMMv2(N=64, K=4, rngs=nnx.Rngs(0))
    else:
        from flashgmm_tpu.models.elic_gmm import Elic2022GMM

        m = Elic2022GMM(N=64, M=160, K=4, rngs=nnx.Rngs(0))
    load_torch_state_dict(m, sd, strict=False)
    return m


@pytest.fixture(scope="module")
def host_math():
    old = os.environ.get("FLASHGMM_HOST_MATH")
    os.environ["FLASHGMM_HOST_MATH"] = "1"
    yield
    if old is None:
        os.environ.pop("FLASHGMM_HOST_MATH", None)
    else:
        os.environ["FLASHGMM_HOST_MATH"] = old


@pytest.fixture(scope="module")
def x(golden):
    return jnp.asarray(nhwc(golden["x"]))


def _gms(model, arch):
    """All GaussianMixtureConditional instances in model-coding order."""
    ycodec = model.latent_codec.latent_codec["y"]
    if arch == "ckbd":
        ckbds = [ycodec]
    else:  # channel groups -> per-group checkerboard codecs
        ckbds = [ycodec.latent_codec[f"y{k}"]
                 for k in range(len(ycodec.groups))]
    return [c.latent_codec["y"].gaussian_mixture_conditional for c in ckbds]


class TestTransformFidelity:
    def test_analysis_and_hyper(self, golden, model, x):
        y = model.g_a(x)
        hyper = model.latent_codec.latent_codec["hyper"]
        z = hyper.h_a(y)
        med = None
        for k in golden.files:
            if k.endswith("entropy_bottleneck.quantiles"):
                med = golden[k][:, 0, 1]
        zs_ref = golden["z"] - med[None, :, None, None]
        zs_ours = nchw(z) - med[None, :, None, None]
        # symbol-level equality (the coding contract)
        assert np.array_equal(np.round(zs_ref), np.round(zs_ours))
        assert np.abs(golden["z"] - nchw(z)).max() < 1e-3


class TestZBranchExchange:
    """EB z strings exchange byte-identically with NO transplants."""

    def test_z_string_bytes(self, golden, model, x, host_math):
        hyper = model.latent_codec.latent_codec["hyper"]
        out = hyper.compress(model.g_a(x))
        [z_strings] = out["strings"]
        assert bytes(z_strings[0]) == golden["z_string_0"].tobytes()

    def test_decode_reference_z_string(self, golden, model):
        hyper = model.latent_codec.latent_codec["hyper"]
        eb = hyper.entropy_bottleneck
        h, w = golden["z"].shape[2:]
        z_hat = eb.decompress([golden["z_string_0"].tobytes()], (h, w))
        assert np.array_equal(nchw(z_hat), golden["z_hat"])


class TestGMMContainerExchange:
    """Per-pass GMM containers are byte-identical given bitwise-equal
    params (FLASHGMM_HOST_MATH=1 reference-exact CDF math)."""

    def test_encode_every_pass(self, arch, golden, model, host_math):
        gms = _gms(model, arch)
        n = int(golden["n_passes"])
        for i in range(n):
            gm = gms[min(i // 2, len(gms) - 1)]
            (rv, abs_max, zb), y_q = gm.compress(
                jnp.asarray(nhwc(golden[f"pass{i}/y"])),
                jnp.asarray(nhwc(golden[f"pass{i}/scales"])),
                jnp.asarray(nhwc(golden[f"pass{i}/means"])),
                jnp.asarray(nhwc(golden[f"pass{i}/weights"])),
            )
            assert bytes(rv) == golden[f"pass{i}/string"].tobytes(), i
            assert int(abs_max) == int(golden[f"pass{i}/abs_max"]), i
            assert np.array_equal(np.asarray(zb),
                                  golden[f"pass{i}/zero_bitmap"]), i
            assert np.array_equal(nchw(y_q), golden[f"pass{i}/y_hat"]), i

    def test_decode_every_reference_pass(self, arch, golden, model, host_math):
        gms = _gms(model, arch)
        n = int(golden["n_passes"])
        for i in range(n):
            gm = gms[min(i // 2, len(gms) - 1)]
            y_hat = gm.decompress(
                golden[f"pass{i}/string"].tobytes(),
                int(golden[f"pass{i}/abs_max"]),
                jnp.asarray(golden[f"pass{i}/zero_bitmap"]),
                jnp.asarray(nhwc(golden[f"pass{i}/dec_scales"])),
                jnp.asarray(nhwc(golden[f"pass{i}/dec_means"])),
                jnp.asarray(nhwc(golden[f"pass{i}/dec_weights"])),
            )
            assert np.array_equal(nchw(y_hat), golden[f"pass{i}/dec_y_hat"]), i


class TestFullModelLevel:
    def test_compress_symbols_and_container(self, golden, model, x, host_math):
        out = model.compress(x)
        *y_strings, z_strings = out["strings"]
        assert bytes(z_strings[0]) == golden["z_string_0"].tobytes()
        assert len(y_strings) == int(golden["n_passes"])
        for i, (s, abs_max, zb) in enumerate(y_strings):
            assert int(abs_max) == int(golden[f"pass{i}/abs_max"]), i
            assert np.array_equal(np.asarray(zb),
                                  golden[f"pass{i}/zero_bitmap"]), i
        assert np.array_equal(nchw(out["y_hat"]), golden["y_hat"])
        dec = model.decompress(out["strings"], out["shape"])
        assert np.abs(nchw(dec["x_hat"]) - golden["x_hat"]).max() < 1e-3

    def test_measured_cdf_divergence(self, arch, golden, model, x, host_math):
        """Documents WHY y-branch byte equality needs bitwise-equal params:
        our-param-derived scales differ bitwise from the reference's on this
        very image, so the transplant above is load-bearing."""
        captured = {}
        gm0 = _gms(model, arch)[0]
        orig = type(gm0).compress

        def spy(self, y_i, scales, means, weights):
            if "scales" not in captured:
                captured["scales"] = np.asarray(scales)
            return orig(self, y_i, scales, means, weights)

        type(gm0).compress = spy
        try:
            model.compress(x)
        finally:
            type(gm0).compress = orig
        n_diff = int((nchw(captured["scales"]) != golden["pass0/scales"]).sum())
        assert n_diff > 0, (
            "params are bitwise equal across torch/XLA; full y-branch byte "
            "exchange would be possible — tighten the interop claim!"
        )
