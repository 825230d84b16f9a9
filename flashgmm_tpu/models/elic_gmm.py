"""ELIC 2022 with GMM entropy coding (compressai/models/elic_gmm.py:63-274).

Uneven channel groups x checkerboard spatial context (SCCTX), K-mixture
GMM conditionals, residual-bottleneck transforms with attention.
"""

from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck
from flashgmm_tpu.latent_codecs import (
    ChannelGroupsLatentCodec,
    CheckerboardLatentCodec,
    GaussianMixtureConditionalLatentCodec,
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
    sequential_channel_ramp,
)
from flashgmm_tpu.layers.layers import Conv2d, ReLU
from flashgmm_tpu.registry import register_model

from .base import SimpleVAECompressionModel


@register_model("elic2022-official")
class Elic2022GMM(SimpleVAECompressionModel):
    def __init__(self, N=192, M=320, K=4, quantizer="noise", groups=None,
                 *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.N, self.M, self.K = int(N), int(M), int(K)

        if groups is None:
            groups = [16, 16, 32, 64, M - 128]
        self.groups = list(groups)
        assert sum(self.groups) == M

        self.g_a = Sequential(
            conv(3, N, kernel_size=5, stride=2, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            conv(N, N, kernel_size=5, stride=2, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            AttentionBlock(N, rngs=rngs),
            conv(N, N, kernel_size=5, stride=2, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            conv(N, M, kernel_size=5, stride=2, rngs=rngs),
            AttentionBlock(M, rngs=rngs),
        )

        self.g_s = Sequential(
            AttentionBlock(M, rngs=rngs),
            deconv(M, N, kernel_size=5, stride=2, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            deconv(N, N, kernel_size=5, stride=2, rngs=rngs),
            AttentionBlock(N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            deconv(N, N, kernel_size=5, stride=2, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
            ResidualBottleneckBlock(N, N, rngs=rngs),
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

        # g_ch^(t): channel context over previously decoded groups
        channel_context = {
            f"y{t}": sequential_channel_ramp(
                sum(self.groups[:t]),
                self.groups[t] * 2,
                min_ch=N,
                num_layers=3,
                make_layer=conv_factory(5, 2),
                make_act=ReLU,
                rngs=rngs,
            )
            for t in range(1, len(self.groups))
        }

        # g_sp^(t): checkerboard spatial context per group
        spatial_context = [
            CheckerboardMaskedConv2d(
                self.groups[t], self.groups[t] * 2, kernel_size=5, stride=1,
                padding=2, rngs=rngs,
            )
            for t in range(len(self.groups))
        ]

        # Param aggregation: spatial ctx + channel ctx + hyper side -> 3KM_t
        param_aggregation = [
            sequential_channel_ramp(
                self.groups[t] * 2 + (t > 0) * self.groups[t] * 2 + N * 2,
                self.groups[t] * 3 * self.K,
                min_ch=N * 2,
                num_layers=3,
                make_layer=conv_factory(1, 0),
                make_act=ReLU,
                rngs=rngs,
            )
            for t in range(len(self.groups))
        ]

        scctx_latent_codec = {
            f"y{t}": CheckerboardLatentCodec(
                latent_codec={
                    "y": GaussianMixtureConditionalLatentCodec(
                        K=self.K, quantizer=quantizer
                    ),
                },
                context_prediction=spatial_context[t],
                entropy_parameters=param_aggregation[t],
                forward_method="onepass",
            )
            for t in range(len(self.groups))
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
