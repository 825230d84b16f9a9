"""SenseTime model line (compressai/models/sensetime.py:69-546): the
single-Gaussian counterparts of the GMM models."""

from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck
from flashgmm_tpu.latent_codecs import (
    ChannelGroupsLatentCodec,
    CheckerboardLatentCodec,
    GaussianConditionalLatentCodec,
    HyperLatentCodec,
    HyperpriorLatentCodec,
)
from flashgmm_tpu.layers import (
    AttentionBlock,
    CheckerboardMaskedConv2d,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    ResidualBottleneckBlock,
    Sequential,
    conv,
    conv3x3,
    deconv,
    sequential_channel_ramp,
    subpel_conv3x3,
)
from flashgmm_tpu.layers.layers import Conv2d, LeakyReLU, ReLU
from flashgmm_tpu.registry import register_model

from .base import SimpleVAECompressionModel
from .waseda import _cheng_g_s, _cheng_h_a, _cheng_h_s


@register_model("cheng2020-anchor-checkerboard")
class Cheng2020AnchorCheckerboard(SimpleVAECompressionModel):
    """Cheng2020 with the checkerboard context model (sensetime.py:69-172):
    the single-Gaussian counterpart of Cheng2020AnchorCheckerboardGMMv2."""

    def __init__(self, N=192, *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.N = int(N)

        self.g_a = Sequential(
            ResidualBlockWithStride(3, N, stride=2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockWithStride(N, N, stride=2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockWithStride(N, N, stride=2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            conv3x3(N, N, stride=2, rngs=rngs),
        )
        self.g_s = _cheng_g_s(N, rngs)

        self.latent_codec = HyperpriorLatentCodec(
            latent_codec={
                "y": CheckerboardLatentCodec(
                    latent_codec={
                        "y": GaussianConditionalLatentCodec(quantizer="ste"),
                    },
                    entropy_parameters=Sequential(
                        Conv2d(N * 12 // 3, N * 10 // 3, 1, rngs=rngs),
                        LeakyReLU(),
                        Conv2d(N * 10 // 3, N * 8 // 3, 1, rngs=rngs),
                        LeakyReLU(),
                        Conv2d(N * 8 // 3, N * 6 // 3, 1, rngs=rngs),
                    ),
                    context_prediction=CheckerboardMaskedConv2d(
                        N, 2 * N, kernel_size=5, stride=1, padding=2, rngs=rngs
                    ),
                    forward_method="twopass",
                ),
                "hyper": HyperLatentCodec(
                    entropy_bottleneck=EntropyBottleneck(N, rngs=rngs),
                    h_a=_cheng_h_a(N, rngs),
                    h_s=_cheng_h_s(N, rngs),
                    quantizer="ste",
                ),
            },
        )


@register_model("elic2022-gaussian")
class Elic2022Official(SimpleVAECompressionModel):
    """ELIC with single-Gaussian conditionals (sensetime.py:174-342)."""

    def __init__(self, N=192, M=320, groups=None, *, rngs: nnx.Rngs = None,
                 **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.N, self.M = int(N), int(M)
        if groups is None:
            groups = [16, 16, 32, 64, M - 128]
        self.groups = list(groups)
        assert sum(self.groups) == M

        def bottlenecks():
            return [ResidualBottleneckBlock(N, N, rngs=rngs) for _ in range(3)]

        self.g_a = Sequential(
            conv(3, N, kernel_size=5, stride=2, rngs=rngs), *bottlenecks(),
            conv(N, N, kernel_size=5, stride=2, rngs=rngs), *bottlenecks(),
            AttentionBlock(N, rngs=rngs),
            conv(N, N, kernel_size=5, stride=2, rngs=rngs), *bottlenecks(),
            conv(N, M, kernel_size=5, stride=2, rngs=rngs),
            AttentionBlock(M, rngs=rngs),
        )
        self.g_s = Sequential(
            AttentionBlock(M, rngs=rngs),
            deconv(M, N, kernel_size=5, stride=2, rngs=rngs), *bottlenecks(),
            deconv(N, N, kernel_size=5, stride=2, rngs=rngs),
            AttentionBlock(N, rngs=rngs), *bottlenecks(),
            deconv(N, N, kernel_size=5, stride=2, rngs=rngs), *bottlenecks(),
            deconv(N, 3, kernel_size=5, stride=2, rngs=rngs),
        )

        h_a = Sequential(
            conv(M, N, kernel_size=3, stride=1, rngs=rngs), ReLU(),
            conv(N, N, kernel_size=5, stride=2, rngs=rngs), ReLU(),
            conv(N, N, kernel_size=5, stride=2, rngs=rngs),
        )
        h_s = Sequential(
            deconv(N, N, kernel_size=5, stride=2, rngs=rngs), ReLU(),
            deconv(N, N * 3 // 2, kernel_size=5, stride=2, rngs=rngs), ReLU(),
            deconv(N * 3 // 2, N * 2, kernel_size=3, stride=1, rngs=rngs),
        )

        def conv_factory(ksize, pad):
            def make(in_ch, out_ch, *, rngs):
                return Conv2d(in_ch, out_ch, ksize, stride=1, padding=pad,
                              rngs=rngs)
            return make

        channel_context = {
            f"y{k}": sequential_channel_ramp(
                sum(self.groups[:k]), self.groups[k] * 2, min_ch=N,
                num_layers=3, make_layer=conv_factory(5, 2), make_act=ReLU,
                rngs=rngs,
            )
            for k in range(1, len(self.groups))
        }
        spatial_context = [
            CheckerboardMaskedConv2d(
                self.groups[k], self.groups[k] * 2, kernel_size=5, stride=1,
                padding=2, rngs=rngs,
            )
            for k in range(len(self.groups))
        ]
        param_aggregation = [
            sequential_channel_ramp(
                self.groups[k] * 2 + (k > 0) * self.groups[k] * 2 + N * 2,
                self.groups[k] * 2, min_ch=N * 2, num_layers=3,
                make_layer=conv_factory(1, 0), make_act=ReLU, rngs=rngs,
            )
            for k in range(len(self.groups))
        ]

        scctx_latent_codec = {
            f"y{k}": CheckerboardLatentCodec(
                latent_codec={
                    "y": GaussianConditionalLatentCodec(quantizer="ste"),
                },
                context_prediction=spatial_context[k],
                entropy_parameters=param_aggregation[k],
                forward_method="twopass",
            )
            for k in range(len(self.groups))
        }

        self.latent_codec = HyperpriorLatentCodec(
            latent_codec={
                "y": ChannelGroupsLatentCodec(
                    groups=self.groups,
                    channel_context=channel_context,
                    latent_codec=scctx_latent_codec,
                ),
                "hyper": HyperLatentCodec(
                    entropy_bottleneck=EntropyBottleneck(N, rngs=rngs),
                    h_a=h_a,
                    h_s=h_s,
                    quantizer="ste",
                ),
            },
        )
