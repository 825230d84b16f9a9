"""Cheng2020 models (compressai/models/waseda.py:46-160).

Residual conv transforms with (optionally) attention; autoregressive
context model inherited from JointAutoregressiveHierarchicalPriors.
"""

from flax import nnx

from flashgmm_tpu.layers import (
    AttentionBlock,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    Sequential,
    conv3x3,
    subpel_conv3x3,
)
from flashgmm_tpu.layers.layers import LeakyReLU
from flashgmm_tpu.registry import register_model

from .google import JointAutoregressiveHierarchicalPriors


def _cheng_h_a(N, rngs):
    return Sequential(
        conv3x3(N, N, rngs=rngs), LeakyReLU(),
        conv3x3(N, N, rngs=rngs), LeakyReLU(),
        conv3x3(N, N, stride=2, rngs=rngs), LeakyReLU(),
        conv3x3(N, N, rngs=rngs), LeakyReLU(),
        conv3x3(N, N, stride=2, rngs=rngs),
    )


def _cheng_h_s(N, rngs):
    return Sequential(
        conv3x3(N, N, rngs=rngs), LeakyReLU(),
        subpel_conv3x3(N, N, 2, rngs=rngs), LeakyReLU(),
        conv3x3(N, N * 3 // 2, rngs=rngs), LeakyReLU(),
        subpel_conv3x3(N * 3 // 2, N * 3 // 2, 2, rngs=rngs), LeakyReLU(),
        conv3x3(N * 3 // 2, N * 2, rngs=rngs),
    )


def _cheng_g_s(N, rngs):
    return Sequential(
        ResidualBlock(N, N, rngs=rngs),
        ResidualBlockUpsample(N, N, 2, rngs=rngs),
        ResidualBlock(N, N, rngs=rngs),
        ResidualBlockUpsample(N, N, 2, rngs=rngs),
        ResidualBlock(N, N, rngs=rngs),
        ResidualBlockUpsample(N, N, 2, rngs=rngs),
        ResidualBlock(N, N, rngs=rngs),
        subpel_conv3x3(N, 3, 2, rngs=rngs),
    )


@register_model("cheng2020-anchor")
class Cheng2020Anchor(JointAutoregressiveHierarchicalPriors):
    def __init__(self, N=192, *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(N=N, M=N, rngs=rngs, **kwargs)

        self.g_a = Sequential(
            ResidualBlockWithStride(3, N, stride=2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockWithStride(N, N, stride=2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockWithStride(N, N, stride=2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            conv3x3(N, N, stride=2, rngs=rngs),
        )
        self.h_a = _cheng_h_a(N, rngs)
        self.h_s = _cheng_h_s(N, rngs)
        self.g_s = _cheng_g_s(N, rngs)


@register_model("cheng2020-attn")
class Cheng2020Attention(Cheng2020Anchor):
    def __init__(self, N=192, *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(N=N, rngs=rngs, **kwargs)

        self.g_a = Sequential(
            ResidualBlockWithStride(3, N, stride=2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockWithStride(N, N, stride=2, rngs=rngs),
            AttentionBlock(N, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockWithStride(N, N, stride=2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            conv3x3(N, N, stride=2, rngs=rngs),
            AttentionBlock(N, rngs=rngs),
        )
        self.g_s = Sequential(
            AttentionBlock(N, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockUpsample(N, N, 2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockUpsample(N, N, 2, rngs=rngs),
            AttentionBlock(N, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            ResidualBlockUpsample(N, N, 2, rngs=rngs),
            ResidualBlock(N, N, rngs=rngs),
            subpel_conv3x3(N, 3, 2, rngs=rngs),
        )
