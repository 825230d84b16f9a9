"""Raster-scan autoregressive latent codec
(compressai/latent_codecs/rasterscan.py:54-340).

Wraps the host serial AR machinery (runtime/rasterscan.py) in the
LatentCodec interface: training forward is a dense TPU pass through the
masked context conv; real coding is the per-pixel host loop.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from flashgmm_tpu.entropy_models import GaussianConditional
from flashgmm_tpu.registry import register_module

from .base import LatentCodec


@register_module("RasterScanLatentCodec")
class RasterScanLatentCodec(LatentCodec):
    def __init__(self, gaussian_conditional: Optional[GaussianConditional] = None,
                 entropy_parameters=None, context_prediction=None, **kwargs):
        self.gaussian_conditional = gaussian_conditional or GaussianConditional()
        self.entropy_parameters = entropy_parameters
        self.context_prediction = context_prediction

    @property
    def kernel_size(self):
        return self.context_prediction.kernel.value.shape[0]

    def __call__(self, y, params, training: bool = True, key=None):
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        y_hat = self.gaussian_conditional.quantize(
            y, "noise" if training else "dequantize", key=k1
        )
        ctx_params = self.context_prediction(y_hat)
        gaussian_params = self.entropy_parameters(
            jnp.concatenate([params, ctx_params], axis=-1)
        )
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        _, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, means=means_hat, training=training, key=k2
        )
        return {"likelihoods": {"y": y_likelihoods}, "y_hat": y_hat}

    def _host_pieces(self):
        from flashgmm_tpu.runtime.rasterscan import (
            HostEntropyParameters,
            HostMaskedConv,
        )

        gc = self.gaussian_conditional
        tables = (
            np.asarray(jax.device_get(gc.quantized_cdf)),
            np.asarray(jax.device_get(gc.cdf_length)).ravel(),
            np.asarray(jax.device_get(gc.offset)).ravel(),
        )
        scale_table = np.asarray(jax.device_get(gc.scale_table.value))
        return (
            HostMaskedConv(self.context_prediction),
            HostEntropyParameters(self.entropy_parameters),
            tables,
            scale_table,
            gc.scale_bound,
        )

    def compress(self, y, params):
        from flashgmm_tpu.runtime.rasterscan import (
            raster_scan_compress_single_stream,
        )

        ctx_conv, ep, tables, st, sb = self._host_pieces()
        y_np = np.asarray(jax.device_get(y))
        p_np = np.asarray(jax.device_get(params))
        strings = [
            raster_scan_compress_single_stream(
                y_np[i], p_np[i], ctx_conv, ep, tables, st, sb
            )
            for i in range(y_np.shape[0])
        ]
        # reconstruct y_hat like the decoder will
        y_hat = self.decompress([strings], y.shape[1:3], params)["y_hat"]
        return {"strings": [strings], "shape": y.shape[1:3], "y_hat": y_hat}

    def decompress(self, strings, shape, params, **kwargs):
        from flashgmm_tpu.runtime.rasterscan import (
            raster_scan_decompress_single_stream,
        )

        (y_strings,) = strings
        ctx_conv, ep, tables, st, sb = self._host_pieces()
        p_np = np.asarray(jax.device_get(params))
        c = self.context_prediction.in_ch
        outs = [
            raster_scan_decompress_single_stream(
                s, p_np[i], ctx_conv, ep, tables, st, sb,
                (shape[0], shape[1], c),
            )
            for i, s in enumerate(y_strings)
        ]
        return {"y_hat": jnp.asarray(np.stack(outs))}
