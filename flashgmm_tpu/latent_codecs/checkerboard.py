"""Two-pass checkerboard context codec (He2021)
(compressai/latent_codecs/checkerboard.py:50-417).

TPU framing: the spatial autoregression collapses into exactly two dense
passes (anchors, then non-anchors conditioned on them), each a batched
conv + pointwise entropy-parameter network — no per-pixel loops. The
unembed/embed checkerboard <-> dense reshapes are pure gather-free slicing.
All tensors NHWC.
"""

from typing import Mapping, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.registry import register_module

from .base import LatentCodec
from .gaussian_conditional import GaussianConditionalLatentCodec


def _checkerboard_mask(h, w, parity: str, dtype=jnp.float32):
    """[H, W] mask with ones at the given parity's positions.

    'even' = positions where (i + j) is even ((0,0), (0,2), (1,1), ...).
    """
    ii = jnp.arange(h)[:, None]
    jj = jnp.arange(w)[None, :]
    even = ((ii + jj) % 2) == 0
    mask = even if parity == "even" else ~even
    return mask.astype(dtype)


@register_module("CheckerboardLatentCodec")
class CheckerboardLatentCodec(LatentCodec):
    def __init__(
        self,
        latent_codec: Optional[Mapping[str, LatentCodec]] = None,
        entropy_parameters=None,
        context_prediction=None,
        anchor_parity: str = "even",
        forward_method: str = "onepass",
        **kwargs,
    ):
        self.anchor_parity = anchor_parity
        self.non_anchor_parity = {"odd": "even", "even": "odd"}[anchor_parity]
        self.forward_method = forward_method
        self.entropy_parameters = entropy_parameters
        self.context_prediction = context_prediction
        self._set_group_defaults(
            "latent_codec",
            latent_codec,
            defaults={"y": lambda: GaussianConditionalLatentCodec(quantizer="ste")},
        )

    # -- spatial helpers -----------------------------------------------------

    def _mask(self, y, parity: str):
        """Zero out positions of the given parity ('all' zeroes everything)."""
        if parity == "all":
            return jnp.zeros_like(y)
        h, w = y.shape[1], y.shape[2]
        keep = _checkerboard_mask(h, w, {"even": "odd", "odd": "even"}[parity], y.dtype)
        return y * keep[None, :, :, None]

    def _keep_only(self, y, step: str):
        parity = self.non_anchor_parity if step == "anchor" else self.anchor_parity
        return self._mask(y, parity)

    def unembed(self, y):
        """[B, H, W, C] -> [2, B, H, W/2, C]: chunk 0 = anchors, 1 = non.

        Matches the reference packing (checkerboard.py:332-353): even rows of
        chunk 0 take even (resp. odd) columns per the anchor parity.
        """
        even_rows = y[:, 0::2]
        odd_rows = y[:, 1::2]
        if self.anchor_parity == "even":
            a = _interleave_rows(even_rows[:, :, 0::2], odd_rows[:, :, 1::2])
            n = _interleave_rows(even_rows[:, :, 1::2], odd_rows[:, :, 0::2])
        else:
            a = _interleave_rows(even_rows[:, :, 1::2], odd_rows[:, :, 0::2])
            n = _interleave_rows(even_rows[:, :, 0::2], odd_rows[:, :, 1::2])
        return jnp.stack([a, n], axis=0)

    def embed(self, y_):
        """Inverse of :meth:`unembed`: [2, B, H, W/2, C] -> [B, H, W, C]."""
        assert y_.shape[0] == 2
        a, n = y_[0], y_[1]
        b, h, w_half, c = a.shape
        out = jnp.zeros((b, h, w_half * 2, c), a.dtype)
        if self.anchor_parity == "even":
            out = out.at[:, 0::2, 0::2].set(a[:, 0::2])
            out = out.at[:, 1::2, 1::2].set(a[:, 1::2])
            out = out.at[:, 0::2, 1::2].set(n[:, 0::2])
            out = out.at[:, 1::2, 0::2].set(n[:, 1::2])
        else:
            out = out.at[:, 0::2, 1::2].set(a[:, 0::2])
            out = out.at[:, 1::2, 0::2].set(a[:, 1::2])
            out = out.at[:, 0::2, 0::2].set(n[:, 0::2])
            out = out.at[:, 1::2, 1::2].set(n[:, 1::2])
        return out

    def merge(self, *args):
        return jnp.concatenate(args, axis=-1)

    # -- forward (training) --------------------------------------------------

    def __call__(self, y, side_params, training: bool = True, key=None):
        if self.forward_method == "onepass":
            return self._forward_onepass(y, side_params, training, key)
        if self.forward_method == "twopass":
            return self._forward_twopass(y, side_params, training, key)
        if self.forward_method == "twopass_faster":
            return self._forward_twopass_faster(y, side_params, training, key)
        raise ValueError(f"Unknown forward method: {self.forward_method}")

    def _quantize_noise(self, y, training, key):
        if training:
            assert key is not None
            return y + jax.random.uniform(key, y.shape, y.dtype, -0.5, 0.5)
        return jnp.round(y)

    def _forward_onepass(self, y, side_params, training, key):
        """Single EP pass with noise quantization (checkerboard.py:154-171)."""
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        y_hat = self._quantize_noise(y, training, k1)
        y_ctx = self._keep_only(self.context_prediction(y_hat), "non_anchor")
        params = self.entropy_parameters(self.merge(y_ctx, side_params))
        y_out = self.latent_codec["y"](y, params, training=training, key=k2)
        return {"likelihoods": {"y": y_out["likelihoods"]["y"]}, "y_hat": y_hat}

    def _forward_twopass(self, y, side_params, training, key):
        """Two EP passes with STE quantization around predicted means
        (checkerboard.py:173-233)."""
        from flashgmm_tpu.ops import quantize_ste

        k2 = key
        y_ctx_zero = jnp.zeros(
            y.shape[:-1] + (self.context_prediction.out_ch,), y.dtype
        )

        def step(y_ctx, step_name):
            params_i = self.entropy_parameters(self.merge(y_ctx, side_params))
            params_i = self._keep_only(params_i, step_name)
            y_i = self._keep_only(y, step_name)
            scales_i, means_i = self.latent_codec["y"]._chunk(params_i)
            y_hat_i = self._keep_only(quantize_ste(y_i - means_i) + means_i, step_name)
            return y_hat_i, params_i

        y_hat_anchors, params_a = step(y_ctx_zero, "anchor")
        y_hat_non, params_n = step(
            self.context_prediction(y_hat_anchors), "non_anchor"
        )
        y_hat = y_hat_anchors + y_hat_non
        params = (
            self._keep_only(params_a, "anchor")
            + self._keep_only(params_n, "non_anchor")
        )
        y_out = self.latent_codec["y"](y, params, training=training, key=k2)
        return {"likelihoods": {"y": y_out["likelihoods"]["y"]}, "y_hat": y_hat}

    def _forward_twopass_faster(self, y, side_params, training, key):
        """Two EP passes with fewer redundant ops (checkerboard.py:235-267):
        anchors quantized via STE around first-pass means, then the codec
        runs once on the combined params."""
        from flashgmm_tpu.ops import quantize_ste

        y_ctx = jnp.zeros(
            y.shape[:-1] + (self.context_prediction.out_ch,), y.dtype
        )
        params = self.entropy_parameters(self.merge(y_ctx, side_params))
        params = self._keep_only(params, "anchor")
        _, means_hat = self.latent_codec["y"]._chunk(params)
        y_hat_anchors = quantize_ste(y - means_hat) + means_hat
        y_hat_anchors = self._keep_only(y_hat_anchors, "anchor")

        y_ctx = self.context_prediction(y_hat_anchors)
        y_ctx = self._keep_only(y_ctx, "non_anchor")
        params = self.entropy_parameters(self.merge(y_ctx, side_params))
        y_out = self.latent_codec["y"](y, params, training=training, key=key)

        y_hat = y_out["y_hat"]
        # keep the anchor pixels from the STE pass
        y_hat = self._keep_only(y_hat, "non_anchor") + y_hat_anchors
        return {"likelihoods": {"y": y_out["likelihoods"]["y"]}, "y_hat": y_hat}

    # -- real coding: two dense passes ---------------------------------------

    def compress(self, y, side_params):
        b, h, w, c = y.shape
        y_hat_ = jnp.zeros((2, b, h, w // 2, c), y.dtype)
        side_params_ = self.unembed(side_params)
        y_ = self.unembed(y)
        y_strings_ = [None, None]

        for i in range(2):
            y_ctx_i = self.unembed(self.context_prediction(self.embed(y_hat_)))[i]
            if i == 0:
                y_ctx_i = jnp.zeros_like(y_ctx_i)
            params_i = self.entropy_parameters(self.merge(y_ctx_i, side_params_[i]))
            y_out = self.latent_codec["y"].compress(y_[i], params_i)
            y_hat_ = y_hat_.at[i].set(y_out["y_hat"])
            [y_strings_[i]] = y_out["strings"]

        y_hat = self.embed(y_hat_)
        return {"strings": y_strings_, "shape": y_hat.shape[1:], "y_hat": y_hat}

    def decompress(self, strings, shape, side_params, **kwargs):
        y_strings_ = strings
        h, w, c = shape
        b = side_params.shape[0]
        y_hat_ = jnp.zeros((2, b, h, w // 2, c), side_params.dtype)
        side_params_ = self.unembed(side_params)

        for i in range(2):
            y_ctx_i = self.unembed(self.context_prediction(self.embed(y_hat_)))[i]
            if i == 0:
                y_ctx_i = jnp.zeros_like(y_ctx_i)
            params_i = self.entropy_parameters(self.merge(y_ctx_i, side_params_[i]))
            y_out = self.latent_codec["y"].decompress(
                [y_strings_[i]], (h, w // 2), params_i
            )
            y_hat_ = y_hat_.at[i].set(y_out["y_hat"])

        return {"y_hat": self.embed(y_hat_)}


def _interleave_rows(even_rows, odd_rows):
    """Reassemble alternating rows: out[0::2] = even_rows, out[1::2] = odd."""
    b, h_half, w, c = even_rows.shape
    h2 = odd_rows.shape[1]
    if h_half == h2:
        out = jnp.stack([even_rows, odd_rows], axis=2)  # [B, H/2, 2, W, C]
        return out.reshape(b, h_half * 2, w, c)
    # odd total height: one more even row than odd rows
    out = jnp.zeros((b, h_half + h2, w, c), even_rows.dtype)
    out = out.at[:, 0::2].set(even_rows)
    out = out.at[:, 1::2].set(odd_rows)
    return out
