"""Cheng2020 anchor + checkerboard + GMM — FlashGMM's flagship model
(compressai/models/ckbd_gmm.py:61-141).

TPU framing: g_a/g_s are residual conv stacks (MXU); the context model is
two dense checkerboard passes; the K=4 GMM entropy model codes through the
fused boundary-rows kernel + host rANS.
"""

from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck
from flashgmm_tpu.latent_codecs import (
    CheckerboardLatentCodec,
    GaussianMixtureConditionalLatentCodec,
    HyperLatentCodec,
    HyperpriorLatentCodec,
)
from flashgmm_tpu.layers import (
    CheckerboardMaskedConv2d,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    Sequential,
    conv3x3,
    subpel_conv3x3,
)
from flashgmm_tpu.layers.layers import Conv2d, LeakyReLU
from flashgmm_tpu.registry import register_model

from .base import SimpleVAECompressionModel


@register_model("cheng2020-anchor-checkerboard-gmm")
class Cheng2020AnchorCheckerboardGMMv2(SimpleVAECompressionModel):
    def __init__(self, N=192, K=4, quantizer="noise", *, rngs: nnx.Rngs = None,
                 **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.N = int(N)
        self.K = int(K)

        self.g_a = Sequential(
            ResidualBlockWithStride(3, N, stride=2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockWithStride(N, N, stride=2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockWithStride(N, N, stride=2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            conv3x3(N, N, stride=2, rngs=rngs),
        )

        self.g_s = Sequential(
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockUpsample(N, N, 2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockUpsample(N, N, 2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockUpsample(N, N, 2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            subpel_conv3x3(N, 3, 2, rngs=rngs),
        )

        h_a = Sequential(
            conv3x3(N, N, rngs=rngs), LeakyReLU(),
            conv3x3(N, N, rngs=rngs), LeakyReLU(),
            conv3x3(N, N, stride=2, rngs=rngs), LeakyReLU(),
            conv3x3(N, N, rngs=rngs), LeakyReLU(),
            conv3x3(N, N, stride=2, rngs=rngs),
        )

        h_s = Sequential(
            conv3x3(N, N, rngs=rngs), LeakyReLU(),
            subpel_conv3x3(N, N, 2, rngs=rngs), LeakyReLU(),
            conv3x3(N, N * 3 // 2, rngs=rngs), LeakyReLU(),
            subpel_conv3x3(N * 3 // 2, N * 3 // 2, 2, rngs=rngs), LeakyReLU(),
            conv3x3(N * 3 // 2, N * 2, rngs=rngs),
        )

        self.latent_codec = HyperpriorLatentCodec(
            latent_codec={
                "y": CheckerboardLatentCodec(
                    latent_codec={
                        "y": GaussianMixtureConditionalLatentCodec(
                            K=self.K, quantizer=quantizer
                        ),
                    },
                    entropy_parameters=Sequential(
                        Conv2d(N * 12 // 3, N * 10 // 3, 1, rngs=rngs),
                        LeakyReLU(),
                        Conv2d(N * 10 // 3, N * 10 // 3, 1, rngs=rngs),
                        LeakyReLU(),
                        Conv2d(N * 10 // 3, 3 * self.K * N, 1, rngs=rngs),
                    ),
                    context_prediction=CheckerboardMaskedConv2d(
                        N, 2 * N, kernel_size=5, stride=1, padding=2, rngs=rngs
                    ),
                    forward_method="onepass",  # twopass unsupported for GMM
                ),
                "hyper": HyperLatentCodec(
                    entropy_bottleneck=EntropyBottleneck(N, rngs=rngs),
                    h_a=h_a,
                    h_s=h_s,
                    quantizer="ste",
                ),
            },
        )
