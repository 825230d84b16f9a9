"""Elic2022Chandelier (compressai/models/sensetime.py:344-546): the
community ELIC reimplementation — channel context from only the first and
most recent groups, (means, scales) parameter order."""

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
    ResidualBottleneckBlock,
    Sequential,
    conv,
    deconv,
)
from flashgmm_tpu.layers.layers import Conv2d, ReLU
from flashgmm_tpu.registry import register_model

from .base import SimpleVAECompressionModel


@register_model("elic2022-chandelier")
class Elic2022Chandelier(SimpleVAECompressionModel):
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
            conv(N * 3 // 2, M * 2, kernel_size=3, stride=1, rngs=rngs),
        )

        channel_context = {
            f"y{k}": Sequential(
                conv(self.groups[0] + (k > 1) * self.groups[k - 1], 224,
                     kernel_size=5, stride=1, rngs=rngs),
                ReLU(),
                conv(224, 128, kernel_size=5, stride=1, rngs=rngs),
                ReLU(),
                conv(128, self.groups[k] * 2, kernel_size=5, stride=1, rngs=rngs),
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
            Sequential(
                Conv2d(self.groups[k] * 2 + (k > 0) * self.groups[k] * 2 + M * 2,
                       M * 2, 1, rngs=rngs),
                ReLU(),
                Conv2d(M * 2, 512, 1, rngs=rngs),
                ReLU(),
                Conv2d(512, self.groups[k] * 2, 1, rngs=rngs),
            )
            for k in range(len(self.groups))
        ]
        scctx_latent_codec = {
            f"y{k}": CheckerboardLatentCodec(
                latent_codec={
                    "y": GaussianConditionalLatentCodec(
                        quantizer="ste", chunks=("means", "scales")
                    ),
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
                    context_mode="first_and_last",
                ),
                "hyper": HyperLatentCodec(
                    entropy_bottleneck=EntropyBottleneck(N, rngs=rngs),
                    h_a=h_a,
                    h_s=h_s,
                    quantizer="ste",
                ),
            },
        )
