"""Ballé/Minnen model line (compressai/models/google.py:66-736).

NHWC re-designs: conv stacks map to MXU-friendly NHWC convolutions, GDN is
a channel matmul. Architectures and parameter shapes correspond 1:1 with
the reference so converted PyTorch checkpoints reproduce outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck, GaussianConditional
from flashgmm_tpu.layers import GDN, MaskedConv2d, Sequential, conv, deconv
from flashgmm_tpu.layers.layers import Conv2d, LeakyReLU, ReLU
from flashgmm_tpu.registry import register_model

from .base import CompressionModel


@register_model("bmshj2018-factorized")
class FactorizedPrior(CompressionModel):
    """Factorized-prior VAE (google.py:66-167): 4 strided convs with GDN each
    way + EntropyBottleneck over the latent."""

    def __init__(self, N, M, *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.entropy_bottleneck = EntropyBottleneck(M, rngs=rngs)

        self.g_a = Sequential(
            conv(3, N, rngs=rngs),
            GDN(N, rngs=rngs),
            conv(N, N, rngs=rngs),
            GDN(N, rngs=rngs),
            conv(N, N, rngs=rngs),
            GDN(N, rngs=rngs),
            conv(N, M, rngs=rngs),
        )

        self.g_s = Sequential(
            deconv(M, N, rngs=rngs),
            GDN(N, inverse=True, rngs=rngs),
            deconv(N, N, rngs=rngs),
            GDN(N, inverse=True, rngs=rngs),
            deconv(N, N, rngs=rngs),
            GDN(N, inverse=True, rngs=rngs),
            deconv(N, 3, rngs=rngs),
        )

        self.N = int(N)
        self.M = int(M)

    @property
    def downsampling_factor(self) -> int:
        return 2**4

    def __call__(self, x, training: bool = True, key=None):
        y = self.g_a(x)
        y_hat, y_likelihoods = self.entropy_bottleneck(y, training=training, key=key)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods}}

    def compress(self, x):
        y = self.g_a(x)
        y_strings = self.entropy_bottleneck.compress(y)
        return {"strings": [y_strings], "shape": y.shape[1:3]}

    def decompress(self, strings, shape):
        assert isinstance(strings, list) and len(strings) == 1
        y_hat = self.entropy_bottleneck.decompress(strings[0], shape)
        x_hat = jnp.clip(self.g_s(y_hat), 0.0, 1.0)
        return {"x_hat": x_hat}


@register_model("bmshj2018-factorized-relu")
class FactorizedPriorReLU(FactorizedPrior):
    """GDN replaced by ReLU (google.py:168-205)."""

    def __init__(self, N, M, *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        CompressionModel.__init__(self)
        self.entropy_bottleneck = EntropyBottleneck(M, rngs=rngs)
        self.g_a = Sequential(
            conv(3, N, rngs=rngs), ReLU(),
            conv(N, N, rngs=rngs), ReLU(),
            conv(N, N, rngs=rngs), ReLU(),
            conv(N, M, rngs=rngs),
        )
        self.g_s = Sequential(
            deconv(M, N, rngs=rngs), ReLU(),
            deconv(N, N, rngs=rngs), ReLU(),
            deconv(N, N, rngs=rngs), ReLU(),
            deconv(N, 3, rngs=rngs),
        )
        self.N = int(N)
        self.M = int(M)


@register_model("bmshj2018-hyperprior")
class ScaleHyperprior(CompressionModel):
    """Scale hyperprior (google.py:206-337): z models the scales of y."""

    def __init__(self, N, M, *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.entropy_bottleneck = EntropyBottleneck(N, rngs=rngs)

        self.g_a = Sequential(
            conv(3, N, rngs=rngs), GDN(N, rngs=rngs),
            conv(N, N, rngs=rngs), GDN(N, rngs=rngs),
            conv(N, N, rngs=rngs), GDN(N, rngs=rngs),
            conv(N, M, rngs=rngs),
        )
        self.g_s = Sequential(
            deconv(M, N, rngs=rngs), GDN(N, inverse=True, rngs=rngs),
            deconv(N, N, rngs=rngs), GDN(N, inverse=True, rngs=rngs),
            deconv(N, N, rngs=rngs), GDN(N, inverse=True, rngs=rngs),
            deconv(N, 3, rngs=rngs),
        )
        self.h_a = Sequential(
            conv(M, N, stride=1, kernel_size=3, rngs=rngs), ReLU(),
            conv(N, N, rngs=rngs), ReLU(),
            conv(N, N, rngs=rngs),
        )
        self.h_s = Sequential(
            deconv(N, N, rngs=rngs), ReLU(),
            deconv(N, N, rngs=rngs), ReLU(),
            conv(N, M, stride=1, kernel_size=3, rngs=rngs), ReLU(),
        )

        self.gaussian_conditional = GaussianConditional()
        self.N = int(N)
        self.M = int(M)

    @property
    def downsampling_factor(self) -> int:
        return 2 ** (4 + 2)

    def __call__(self, x, training: bool = True, key=None):
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        y = self.g_a(x)
        z = self.h_a(jnp.abs(y))
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training, key=k1)
        scales_hat = self.h_s(z_hat)
        y_hat, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, training=training, key=k2
        )
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    def compress(self, x):
        y = self.g_a(x)
        z = self.h_a(jnp.abs(y))
        z_strings = self.entropy_bottleneck.compress(z)
        z_hat = self.entropy_bottleneck.decompress(z_strings, z.shape[1:3])
        scales_hat = self.h_s(z_hat)
        indexes = self.gaussian_conditional.build_indexes(scales_hat)
        y_strings = self.gaussian_conditional.compress(y, indexes)
        return {"strings": [y_strings, z_strings], "shape": z.shape[1:3]}

    def decompress(self, strings, shape):
        assert isinstance(strings, list) and len(strings) == 2
        z_hat = self.entropy_bottleneck.decompress(strings[1], shape)
        scales_hat = self.h_s(z_hat)
        indexes = self.gaussian_conditional.build_indexes(scales_hat)
        y_hat = self.gaussian_conditional.decompress(strings[0], indexes)
        x_hat = jnp.clip(self.g_s(y_hat), 0.0, 1.0)
        return {"x_hat": x_hat}


@register_model("mbt2018-mean")
class MeanScaleHyperprior(ScaleHyperprior):
    """Mean+scale hyperprior (google.py:338-438). ``coder="table"`` uses the
    standard CompressAI table path; ``coder="search"`` uses the FlashGMM-style
    table-free single-Gaussian rows path (search-based decoding)."""

    def __init__(self, N, M, *, coder: str = "table", rngs: nnx.Rngs = None,
                 **kwargs):
        super().__init__(N, M, rngs=rngs, **kwargs)
        rngs = rngs or nnx.Rngs(0)
        assert coder in ("table", "search")
        self.coder = coder

        self.h_a = Sequential(
            conv(M, N, stride=1, kernel_size=3, rngs=rngs), LeakyReLU(),
            conv(N, N, rngs=rngs), LeakyReLU(),
            conv(N, N, rngs=rngs),
        )
        self.h_s = Sequential(
            deconv(N, M, rngs=rngs), LeakyReLU(),
            deconv(M, M * 3 // 2, rngs=rngs), LeakyReLU(),
            conv(M * 3 // 2, M * 2, stride=1, kernel_size=3, rngs=rngs),
        )

    def __call__(self, x, training: bool = True, key=None):
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training, key=k1)
        gaussian_params = self.h_s(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        y_hat, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, means=means_hat, training=training, key=k2
        )
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    def compress(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        z_strings = self.entropy_bottleneck.compress(z)
        z_hat = self.entropy_bottleneck.decompress(z_strings, z.shape[1:3])
        gaussian_params = self.h_s(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        if self.coder == "search":
            scales_hat = jnp.clip(scales_hat, 0.11, 256)
            y_strings, abs_max = self.gaussian_conditional.compress_search(
                y, scales_hat, means=means_hat
            )
            return {
                "strings": [y_strings, z_strings],
                "shape": z.shape[1:3],
                "abs_max": abs_max,
            }
        indexes = self.gaussian_conditional.build_indexes(scales_hat)
        y_strings = self.gaussian_conditional.compress(y, indexes, means_hat)
        return {"strings": [y_strings, z_strings], "shape": z.shape[1:3]}

    def decompress(self, strings, shape, abs_max=None):
        assert isinstance(strings, list) and len(strings) == 2
        z_hat = self.entropy_bottleneck.decompress(strings[1], shape)
        gaussian_params = self.h_s(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        if self.coder == "search":
            scales_hat = jnp.clip(scales_hat, 0.11, 256)
            y_hat = self.gaussian_conditional.decompress_search(
                strings[0], scales_hat, abs_max, means=means_hat
            )
        else:
            indexes = self.gaussian_conditional.build_indexes(scales_hat)
            y_hat = self.gaussian_conditional.decompress(
                strings[0], indexes, means=means_hat
            )
        x_hat = jnp.clip(self.g_s(y_hat), 0.0, 1.0)
        return {"x_hat": x_hat}


@register_model("mbt2018")
class JointAutoregressiveHierarchicalPriors(MeanScaleHyperprior):
    """mbt2018: hyperprior + PixelCNN spatial context (google.py:439-736).

    The dense (training) forward runs fully on TPU; ``compress``/
    ``decompress`` run the inherently-serial raster scan on host
    (runtime/rasterscan.py) like the reference's per-pixel loop.
    """

    def __init__(self, N=192, M=192, *, rngs: nnx.Rngs = None, **kwargs):
        super().__init__(N, M, rngs=rngs, **kwargs)
        rngs = rngs or nnx.Rngs(0)

        self.h_a = Sequential(
            conv(M, N, stride=1, kernel_size=3, rngs=rngs), LeakyReLU(),
            conv(N, N, stride=2, kernel_size=5, rngs=rngs), LeakyReLU(),
            conv(N, N, stride=2, kernel_size=5, rngs=rngs),
        )
        self.h_s = Sequential(
            deconv(N, M, stride=2, kernel_size=5, rngs=rngs), LeakyReLU(),
            deconv(M, M * 3 // 2, stride=2, kernel_size=5, rngs=rngs), LeakyReLU(),
            conv(M * 3 // 2, M * 2, stride=1, kernel_size=3, rngs=rngs),
        )
        self.entropy_parameters = Sequential(
            Conv2d(M * 12 // 3, M * 10 // 3, 1, rngs=rngs), LeakyReLU(),
            Conv2d(M * 10 // 3, M * 8 // 3, 1, rngs=rngs), LeakyReLU(),
            Conv2d(M * 8 // 3, M * 6 // 3, 1, rngs=rngs),
        )
        self.context_prediction = MaskedConv2d(
            M, 2 * M, kernel_size=5, padding=2, stride=1, rngs=rngs
        )

    def __call__(self, x, training: bool = True, key=None):
        k1, k2, k3 = (
            jax.random.split(key, 3) if key is not None else (None, None, None)
        )
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training, key=k1)
        params = self.h_s(z_hat)

        y_hat = self.gaussian_conditional.quantize(
            y, "noise" if training else "dequantize", key=k2
        )
        ctx_params = self.context_prediction(y_hat)
        gaussian_params = self.entropy_parameters(
            jnp.concatenate([params, ctx_params], axis=-1)
        )
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        _, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, means=means_hat, training=training, key=k3
        )
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    def _host_ar_pieces(self):
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

    def compress(self, x):
        from flashgmm_tpu.runtime.rasterscan import (
            raster_scan_compress_single_stream,
        )

        y = self.g_a(x)
        z = self.h_a(y)
        z_strings = self.entropy_bottleneck.compress(z)
        z_hat = self.entropy_bottleneck.decompress(z_strings, z.shape[1:3])
        params = self.h_s(z_hat)

        ctx_conv, ep, tables, scale_table, scale_bound = self._host_ar_pieces()
        y_np = np.asarray(jax.device_get(y))
        params_np = np.asarray(jax.device_get(params))

        y_strings = []
        for i in range(y_np.shape[0]):
            y_strings.append(
                raster_scan_compress_single_stream(
                    y_np[i], params_np[i], ctx_conv, ep, tables,
                    scale_table, scale_bound,
                )
            )
        return {"strings": [y_strings, z_strings], "shape": z.shape[1:3]}

    def decompress(self, strings, shape):
        from flashgmm_tpu.runtime.rasterscan import (
            raster_scan_decompress_single_stream,
        )

        assert isinstance(strings, list) and len(strings) == 2
        z_hat = self.entropy_bottleneck.decompress(strings[1], shape)
        params = self.h_s(z_hat)

        ctx_conv, ep, tables, scale_table, scale_bound = self._host_ar_pieces()
        params_np = np.asarray(jax.device_get(params))
        h, w = shape[0] * 4, shape[1] * 4

        y_hats = []
        for i, y_string in enumerate(strings[0]):
            y_hats.append(
                raster_scan_decompress_single_stream(
                    y_string, params_np[i], ctx_conv, ep, tables,
                    scale_table, scale_bound, (h, w, self.M),
                )
            )
        y_hat = jnp.asarray(np.stack(y_hats))
        x_hat = jnp.clip(self.g_s(y_hat), 0.0, 1.0)
        return {"x_hat": x_hat}
