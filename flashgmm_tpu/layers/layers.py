"""NN building blocks (NHWC, flax.nnx).

Re-designs of compressai/layers/layers.py for TPU: explicit torch-compatible
padding (so converted checkpoints are numerically identical), pixel-shuffle
upsampling via reshapes, masked convolutions with static masks baked at
construction time.
"""

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import nnx

from .gdn import GDN


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


class LeakyReLU(nnx.Module):
    def __init__(self, negative_slope: float = 0.01):
        self.negative_slope = negative_slope

    def __call__(self, x):
        return leaky_relu(x, self.negative_slope)


class ReLU(nnx.Module):
    def __call__(self, x):
        return jax.nn.relu(x)


class Sequential(nnx.Module):
    """Ordered container of callables (modules or plain functions)."""

    def __init__(self, *layers):
        self.layers = nnx.List(list(layers))

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x

    def __iter__(self):
        return iter(self.layers)

    def __getitem__(self, i):
        return self.layers[i]


def _torch_conv_init(key, shape, dtype, groups: int = 1):
    """Kaiming-uniform(a=sqrt(5)) over HWIO kernels, matching torch Conv2d."""
    kh, kw, in_ch, _ = shape
    fan_in = kh * kw * in_ch * groups
    bound = 1.0 / math.sqrt(fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv2d(nnx.Module):
    """2D convolution over NHWC with torch-style explicit symmetric padding.

    Note: XLA's 'SAME' padding differs from torch's explicit ``padding=k//2``
    for even inputs with stride 2 (different window placement), so we always
    use explicit padding to keep converted checkpoints bit-compatible.
    """

    def __init__(
        self,
        in_ch: int,
        out_ch: int,
        kernel_size,
        stride=1,
        padding=0,
        use_bias: bool = True,
        *,
        rngs: nnx.Rngs,
    ):
        kh, kw = _pair(kernel_size)
        self.stride = _pair(stride)
        ph, pw = _pair(padding)
        self.padding = ((ph, ph), (pw, pw))
        self.in_ch = in_ch
        self.out_ch = out_ch

        kkey = rngs.params()
        self.kernel = nnx.Param(
            _torch_conv_init(kkey, (kh, kw, in_ch, out_ch), jnp.float32)
        )
        if use_bias:
            fan_in = kh * kw * in_ch
            bound = 1.0 / math.sqrt(fan_in)
            self.bias = nnx.Param(
                jax.random.uniform(rngs.params(), (out_ch,), jnp.float32, -bound, bound)
            )
        else:
            self.bias = None

    def _weight(self):
        return self.kernel.value

    def __call__(self, x):
        w = self._weight()
        # Hand-tiled MXU kernel for the inference path (the runtime codecs
        # enter use_pallas_conv() while tracing; see ops/pallas_conv.py).
        # bf16 activations compute in bf16 (the fast transforms); f32
        # activations compute in f32 (the fenced entropy-parameter chain,
        # where the kernel's cross-program bitwise reproducibility is the
        # point). Everything else keeps the XLA conv.
        if x.dtype in (jnp.bfloat16, jnp.float32):
            from flashgmm_tpu.ops import pallas_conv as _pc

            kh, kw = w.shape[0], w.shape[1]
            if (_pc.pallas_conv_enabled()
                    and jax.default_backend() == "tpu"
                    and self.padding == ((kh // 2, kh // 2), (kw // 2, kw // 2))
                    and _pc.conv2d_supported(x.shape, w.shape, self.stride)):
                return _pc.conv2d_nhwc_pallas(
                    x, w,
                    None if self.bias is None else self.bias.value,
                    out_dtype=x.dtype, compute_dtype=x.dtype,
                )
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=self.stride,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.bias is not None:
            y = y + self.bias.value
        return y


class ConvTranspose2d(nnx.Module):
    """Transposed conv matching torch ConvTranspose2d semantics.

    Implemented as an input-dilated convolution with the spatially-flipped
    kernel: pad each side by ``k - 1 - p`` (+ ``output_padding`` on the
    bottom/right), dilate the input by ``stride``.
    """

    def __init__(
        self,
        in_ch: int,
        out_ch: int,
        kernel_size,
        stride=1,
        padding=0,
        output_padding=0,
        use_bias: bool = True,
        *,
        rngs: nnx.Rngs,
    ):
        kh, kw = _pair(kernel_size)
        self.stride = _pair(stride)
        ph, pw = _pair(padding)
        oph, opw = _pair(output_padding)
        self.padding = (
            (kh - 1 - ph, kh - 1 - ph + oph),
            (kw - 1 - pw, kw - 1 - pw + opw),
        )
        self.in_ch = in_ch
        self.out_ch = out_ch

        # Stored HWIO ("input" = in_ch) like torch's [in, out, kh, kw]; the
        # kernel is flipped at call time.
        kkey = rngs.params()
        fan_in = kh * kw * out_ch  # torch uses the [out] dim for fan-in here
        bound = 1.0 / math.sqrt(fan_in) * math.sqrt(3.0)
        self.kernel = nnx.Param(
            jax.random.uniform(kkey, (kh, kw, in_ch, out_ch), jnp.float32, -bound, bound)
        )
        if use_bias:
            bbound = 1.0 / math.sqrt(fan_in)
            self.bias = nnx.Param(
                jax.random.uniform(
                    rngs.params(), (out_ch,), jnp.float32, -bbound, bbound
                )
            )
        else:
            self.bias = None

    def __call__(self, x):
        kernel = jnp.flip(self.kernel.value, axis=(0, 1))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=self.padding,
            lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.bias is not None:
            y = y + self.bias.value
        return y


def conv(in_ch, out_ch, kernel_size=5, stride=2, *, rngs):
    """CompressAI's default strided conv (models/utils.py conv)."""
    return Conv2d(
        in_ch, out_ch, kernel_size, stride=stride, padding=kernel_size // 2, rngs=rngs
    )


def deconv(in_ch, out_ch, kernel_size=5, stride=2, *, rngs):
    """CompressAI's default up-sampling deconv (models/utils.py deconv)."""
    return ConvTranspose2d(
        in_ch,
        out_ch,
        kernel_size,
        stride=stride,
        padding=kernel_size // 2,
        output_padding=stride - 1,
        rngs=rngs,
    )


def conv3x3(in_ch, out_ch, stride=1, *, rngs):
    return Conv2d(in_ch, out_ch, 3, stride=stride, padding=1, rngs=rngs)


def conv1x1(in_ch, out_ch, stride=1, *, rngs):
    return Conv2d(in_ch, out_ch, 1, stride=stride, padding=0, rngs=rngs)


def pixel_shuffle(x, r: int):
    """NHWC pixel shuffle: [N,H,W,C*r*r] -> [N,H*r,W*r,C].

    Channel ordering matches torch.nn.PixelShuffle (c, i, j fastest-last)
    so converted checkpoints reproduce the reference exactly.
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, c
    return x.reshape(n, h * r, w * r, c)


class PixelShuffle(nnx.Module):
    def __init__(self, r: int):
        self.r = r

    def __call__(self, x):
        return pixel_shuffle(x, self.r)


def subpel_conv3x3(in_ch, out_ch, r=1, *, rngs):
    """3x3 sub-pixel convolution for up-sampling (layers.py:178-182)."""
    return Sequential(
        Conv2d(in_ch, out_ch * r * r, 3, padding=1, rngs=rngs), PixelShuffle(r)
    )


class SpectralConv2d(Conv2d):
    """Conv with weights stored in the real-FFT domain (Ballé 2018
    "spectral Adam"; layers.py:59-106): optimizer updates hit all
    frequencies equally, improving conditioning."""

    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0,
                 use_bias=True, *, rngs):
        super().__init__(in_ch, out_ch, kernel_size, stride, padding,
                         use_bias, rngs=rngs)
        kh, kw, _, _ = self.kernel.value.shape
        self.kernel_size_hw = (kh, kw)
        w = self.kernel.value
        # store transformed; kernel property reconstructs spatial weights
        self.kernel_transformed = nnx.Param(self._to_transform_domain(w))
        del self.kernel

    def _to_transform_domain(self, w):
        return jnp.fft.rfftn(w, s=self.kernel_size_hw, axes=(0, 1), norm="ortho")

    def _from_transform_domain(self, wt):
        return jnp.fft.irfftn(wt, s=self.kernel_size_hw, axes=(0, 1), norm="ortho")

    def _weight(self):
        return self._from_transform_domain(self.kernel_transformed.value)


class SpectralConvTranspose2d(ConvTranspose2d):
    """Transposed variant of :class:`SpectralConv2d`."""

    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0,
                 output_padding=0, use_bias=True, *, rngs):
        super().__init__(in_ch, out_ch, kernel_size, stride, padding,
                         output_padding, use_bias, rngs=rngs)
        kh, kw, _, _ = self.kernel.value.shape
        self.kernel_size_hw = (kh, kw)
        w = self.kernel.value
        self.kernel_transformed = nnx.Param(
            jnp.fft.rfftn(w, s=self.kernel_size_hw, axes=(0, 1), norm="ortho")
        )
        del self.kernel

    def __call__(self, x):
        kernel = jnp.fft.irfftn(
            self.kernel_transformed.value, s=self.kernel_size_hw, axes=(0, 1),
            norm="ortho",
        )
        kernel = jnp.flip(kernel, axis=(0, 1))
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), self.padding, lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.bias is not None:
            y = y + self.bias.value
        return y


class MaskedConv2d(Conv2d):
    """Masked conv for autoregressive context models (layers.py:118-144).

    The mask is static and baked into the forward as ``mask * weight``; type
    'A' masks the current pixel, 'B' keeps it.
    """

    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0,
                 mask_type: str = "A", *, rngs):
        super().__init__(in_ch, out_ch, kernel_size, stride, padding, rngs=rngs)
        if mask_type not in ("A", "B"):
            raise ValueError(f'Invalid "mask_type" value "{mask_type}"')
        kh, kw, _, _ = self.kernel.value.shape
        mask = jnp.ones((kh, kw, 1, 1), jnp.float32)
        mask = mask.at[kh // 2, kw // 2 + (mask_type == "B") :].set(0)
        mask = mask.at[kh // 2 + 1 :].set(0)
        self.mask = nnx.Variable(mask)

    def _weight(self):
        return self.kernel.value * self.mask.value


class CheckerboardMaskedConv2d(MaskedConv2d):
    """Checkerboard-masked conv (He2021; layers.py:147-170): sees only
    anchor positions (and optionally the center for type 'B')."""

    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0,
                 mask_type: str = "A", *, rngs):
        super().__init__(
            in_ch, out_ch, kernel_size, stride, padding, mask_type=mask_type, rngs=rngs
        )
        kh, kw, _, _ = self.kernel.value.shape
        mask = jnp.ones((kh, kw, 1, 1), jnp.float32)
        mask = mask.at[0::2, 0::2].set(0)
        mask = mask.at[1::2, 1::2].set(0)
        mask = mask.at[kh // 2, kw // 2].set(1.0 if mask_type == "B" else 0.0)
        self.mask = nnx.Variable(mask)


class ResidualBlockWithStride(nnx.Module):
    """conv3x3(s) -> lrelu -> conv3x3 -> GDN + skip (layers.py:190-221)."""

    def __init__(self, in_ch, out_ch, stride=2, *, rngs):
        self.conv1 = conv3x3(in_ch, out_ch, stride=stride, rngs=rngs)
        self.conv2 = conv3x3(out_ch, out_ch, rngs=rngs)
        self.gdn = GDN(out_ch, rngs=rngs)
        if stride != 1 or in_ch != out_ch:
            self.skip = conv1x1(in_ch, out_ch, stride=stride, rngs=rngs)
        else:
            self.skip = None

    def __call__(self, x):
        identity = x if self.skip is None else self.skip(x)
        out = self.conv1(x)
        out = leaky_relu(out)
        out = self.conv2(out)
        out = self.gdn(out)
        return out + identity


class ResidualBlockUpsample(nnx.Module):
    """subpel conv -> lrelu -> conv3x3 -> IGDN + subpel skip (layers.py:224-249)."""

    def __init__(self, in_ch, out_ch, upsample=2, *, rngs):
        self.subpel_conv = subpel_conv3x3(in_ch, out_ch, upsample, rngs=rngs)
        self.conv = conv3x3(out_ch, out_ch, rngs=rngs)
        self.igdn = GDN(out_ch, inverse=True, rngs=rngs)
        self.upsample = subpel_conv3x3(in_ch, out_ch, upsample, rngs=rngs)

    def __call__(self, x):
        if _FUSE_RBU:
            return self._call_fused(x)
        identity = self.upsample(x)
        out = self.subpel_conv(x)
        out = leaky_relu(out)
        out = self.conv(out)
        out = self.igdn(out)
        return out + identity

    def _call_fused(self, x):
        """Fused variant: the main subpel conv and the skip subpel conv
        read the SAME input with the same geometry, so their kernels
        concatenate into one conv with twice the output channels — one
        input read, one larger MXU matmul (opt-in: FLASHGMM_FUSE_RBU=1).
        Same math per channel; bf16 tiling may differ at ULP level (fine
        for synthesis pixels, never used on entropy-coding math)."""
        c1, c2 = self.subpel_conv.layers[0], self.upsample.layers[0]
        r = self.subpel_conv.layers[1].r
        k = jnp.concatenate([c1.kernel.value, c2.kernel.value], axis=-1)
        n_out = c1.kernel.value.shape[-1]
        bias = jnp.concatenate([c1.bias.value, c2.bias.value])
        from flashgmm_tpu.ops import pallas_conv as _pc

        if (x.dtype == jnp.bfloat16 and _pc.pallas_conv_enabled()
                and jax.default_backend() == "tpu"
                and _pc.conv2d_supported(x.shape, k.shape, c1.stride)):
            y = _pc.conv2d_nhwc_pallas(x, k, bias, out_dtype=jnp.bfloat16)
        else:
            y = jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), window_strides=c1.stride,
                padding=c1.padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y + bias.astype(x.dtype)
        out = pixel_shuffle(y[..., :n_out], r)
        identity = pixel_shuffle(y[..., n_out:], r)
        out = leaky_relu(out)
        out = self.conv(out)
        out = self.igdn(out)
        return out + identity


# Fuse the two parallel subpel convs inside every ResidualBlockUpsample
# (g_s main + skip paths) into one conv. DEFAULT ON after the on-TPU A/B
# (tools/mfu_analysis.py, v5e batch 24: g_s 186.0 -> 177.7 ms/batch,
# -4.5%); numerics are per-channel identical modulo conv-tiling ULPs
# (bitwise equal on CPU). FLASHGMM_FUSE_RBU=0 restores separate convs.
_FUSE_RBU = __import__("os").environ.get("FLASHGMM_FUSE_RBU", "1") == "1"


class ResidualBlock(nnx.Module):
    """Two 3x3 convs with leaky relu (layers.py:252-282)."""

    def __init__(self, in_ch, out_ch, *, rngs):
        self.conv1 = conv3x3(in_ch, out_ch, rngs=rngs)
        self.conv2 = conv3x3(out_ch, out_ch, rngs=rngs)
        if in_ch != out_ch:
            self.skip = conv1x1(in_ch, out_ch, rngs=rngs)
        else:
            self.skip = None

    def __call__(self, x):
        identity = x if self.skip is None else self.skip(x)
        out = self.conv1(x)
        out = leaky_relu(out)
        out = self.conv2(out)
        out = leaky_relu(out)
        return out + identity


class ResidualBottleneckBlock(nnx.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck used by ELIC
    (models/sensetime.py Elic2022 / models/elic_gmm.py:238-274)."""

    def __init__(self, in_ch, out_ch, *, rngs):
        mid_ch = min(in_ch, out_ch) // 2
        self.conv1 = conv1x1(in_ch, mid_ch, rngs=rngs)
        self.conv2 = conv3x3(mid_ch, mid_ch, rngs=rngs)
        self.conv3 = conv1x1(mid_ch, out_ch, rngs=rngs)
        if in_ch != out_ch:
            self.skip = conv1x1(in_ch, out_ch, rngs=rngs)
        else:
            self.skip = None

    def __call__(self, x):
        identity = x if self.skip is None else self.skip(x)
        out = self.conv1(x)
        out = jax.nn.relu(out)
        out = self.conv2(out)
        out = jax.nn.relu(out)
        out = self.conv3(out)
        return out + identity


class _ResidualUnit(nnx.Module):
    def __init__(self, N, *, rngs):
        self.conv = Sequential(
            conv1x1(N, N // 2, rngs=rngs),
            ReLU(),
            conv3x3(N // 2, N // 2, rngs=rngs),
            ReLU(),
            conv1x1(N // 2, N, rngs=rngs),
        )

    def __call__(self, x):
        return jax.nn.relu(self.conv(x) + x)


class AttentionBlock(nnx.Module):
    """Cheng2020 simplified attention block (layers.py:285-336)."""

    def __init__(self, N, *, rngs):
        self.conv_a = Sequential(
            _ResidualUnit(N, rngs=rngs),
            _ResidualUnit(N, rngs=rngs),
            _ResidualUnit(N, rngs=rngs),
        )
        self.conv_b = Sequential(
            _ResidualUnit(N, rngs=rngs),
            _ResidualUnit(N, rngs=rngs),
            _ResidualUnit(N, rngs=rngs),
            conv1x1(N, N, rngs=rngs),
        )

    def __call__(self, x):
        a = self.conv_a(x)
        b = self.conv_b(x)
        return x + a * jax.nn.sigmoid(b)


def sequential_channel_ramp(
    in_ch: int,
    out_ch: int,
    *,
    min_ch: int = 0,
    num_layers: int = 3,
    make_layer: Callable = None,
    make_act: Callable = None,
    skip_last_act: bool = True,
    rngs: nnx.Rngs,
    **layer_kwargs,
):
    """Interleave layers of linearly ramping channel counts with activations
    (layers.py:391-417)."""
    channels = [
        int(math.floor(in_ch + (out_ch - in_ch) * i / num_layers))
        for i in range(num_layers + 1)
    ]
    channels[1:-1] = [max(c, min_ch) for c in channels[1:-1]]
    layers = []
    for ch_in, ch_out in zip(channels[:-1], channels[1:]):
        layers.append(make_layer(ch_in, ch_out, rngs=rngs, **layer_kwargs))
        layers.append(make_act())
    if skip_last_act:
        layers = layers[:-1]
    return Sequential(*layers)


@jax.custom_vjp
def qrelu(x, bit_depth=8, beta=100):
    """Integer-network clamp with smooth surrogate gradient
    (compressai/layers/layers.py:339-388)."""
    return jnp.clip(x, 0.0, 2**bit_depth - 1)


def _qrelu_fwd(x, bit_depth=8, beta=100):
    return qrelu(x, bit_depth, beta), (x, bit_depth, beta)


def _qrelu_bwd(res, g):
    x, bit_depth, beta = res
    alpha = 0.9943258522851727
    max_value = 2**bit_depth - 1
    grad_sub = jnp.exp(
        (-(alpha**beta)) * jnp.abs(2.0 * x / max_value - 1) ** beta
    ) * g
    out = jnp.where((x < 0) | (x > max_value), grad_sub, g)
    return out, None, None


qrelu.defvjp(_qrelu_fwd, _qrelu_bwd)
