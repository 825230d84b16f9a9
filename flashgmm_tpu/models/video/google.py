"""Scale-space flow video compression (Agustsson 2020)
(compressai/models/video/google.py:50-437), NHWC.

Keyframe + inter (motion/residual) branches, each a mean-scale hyperprior;
inter prediction warps a gaussian scale-space volume of the reference frame
by a learned (flow, scale) field. The trilinear volume warp uses
grid_sample-equivalent normalized coordinates (align_corners=False, border
padding).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck, GaussianConditional
from flashgmm_tpu.layers import Sequential, conv, deconv
from flashgmm_tpu.layers.layers import ReLU
from flashgmm_tpu.ops import quantize_ste
from flashgmm_tpu.registry import register_model

from ..base import CompressionModel


from flashgmm_tpu.layers.layers import qrelu  # noqa: E402


def _encoder(in_planes, rngs, mid=128, out=192):
    return Sequential(
        conv(in_planes, mid, kernel_size=5, stride=2, rngs=rngs), ReLU(),
        conv(mid, mid, kernel_size=5, stride=2, rngs=rngs), ReLU(),
        conv(mid, mid, kernel_size=5, stride=2, rngs=rngs), ReLU(),
        conv(mid, out, kernel_size=5, stride=2, rngs=rngs),
    )


def _decoder(out_planes, rngs, in_planes=192, mid=128):
    return Sequential(
        deconv(in_planes, mid, kernel_size=5, stride=2, rngs=rngs), ReLU(),
        deconv(mid, mid, kernel_size=5, stride=2, rngs=rngs), ReLU(),
        deconv(mid, mid, kernel_size=5, stride=2, rngs=rngs), ReLU(),
        deconv(mid, out_planes, kernel_size=5, stride=2, rngs=rngs),
    )


class _HyperDecoderQReLU(nnx.Module):
    def __init__(self, rngs, planes=192, mid=192):
        self.deconv1 = deconv(planes, mid, kernel_size=5, stride=2, rngs=rngs)
        self.deconv2 = deconv(mid, mid, kernel_size=5, stride=2, rngs=rngs)
        self.deconv3 = deconv(mid, planes, kernel_size=5, stride=2, rngs=rngs)

    def __call__(self, x):
        x = qrelu(self.deconv1(x))
        x = qrelu(self.deconv2(x))
        x = qrelu(self.deconv3(x))
        return x


class _Hyperprior(CompressionModel):
    def __init__(self, rngs, planes=192, mid=192):
        self.entropy_bottleneck = EntropyBottleneck(mid, rngs=rngs)
        self.hyper_encoder = Sequential(
            conv(planes, mid, kernel_size=5, stride=2, rngs=rngs), ReLU(),
            conv(mid, mid, kernel_size=5, stride=2, rngs=rngs), ReLU(),
            conv(mid, mid, kernel_size=5, stride=2, rngs=rngs),
        )
        self.hyper_decoder_mean = Sequential(
            deconv(planes, mid, kernel_size=5, stride=2, rngs=rngs), ReLU(),
            deconv(mid, mid, kernel_size=5, stride=2, rngs=rngs), ReLU(),
            deconv(mid, planes, kernel_size=5, stride=2, rngs=rngs),
        )
        self.hyper_decoder_scale = _HyperDecoderQReLU(rngs, planes, mid)
        self.gaussian_conditional = GaussianConditional()

    def __call__(self, y, training=True, key=None):
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        z = self.hyper_encoder(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training, key=k1)
        scales = self.hyper_decoder_scale(z_hat)
        means = self.hyper_decoder_mean(z_hat)
        _, y_likelihoods = self.gaussian_conditional(
            y, scales, means, training=training, key=k2
        )
        y_hat = quantize_ste(y - means) + means
        return y_hat, {"y": y_likelihoods, "z": z_likelihoods}

    def compress(self, y):
        z = self.hyper_encoder(y)
        z_string = self.entropy_bottleneck.compress(z)
        z_hat = self.entropy_bottleneck.decompress(z_string, z.shape[1:3])
        scales = self.hyper_decoder_scale(z_hat)
        means = self.hyper_decoder_mean(z_hat)
        indexes = self.gaussian_conditional.build_indexes(scales)
        y_string = self.gaussian_conditional.compress(y, indexes, means)
        y_hat = self.gaussian_conditional.quantize(y, "dequantize", means)
        return y_hat, {"strings": [y_string, z_string], "shape": z.shape[1:3]}

    def decompress(self, strings, shape):
        assert isinstance(strings, list) and len(strings) == 2
        z_hat = self.entropy_bottleneck.decompress(strings[1], shape)
        scales = self.hyper_decoder_scale(z_hat)
        means = self.hyper_decoder_mean(z_hat)
        indexes = self.gaussian_conditional.build_indexes(scales)
        return self.gaussian_conditional.decompress(strings[0], indexes, means=means)


def gaussian_kernel1d(k, sigma):
    x = np.arange(k, dtype=np.float32) - (k - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return jnp.asarray(g / g.sum())


def gaussian_blur(x, sigma):
    """Separable gaussian blur over NHWC, reflect-free 'same' padding."""
    k = 2 * int(math.ceil(3 * sigma)) + 1
    g = gaussian_kernel1d(k, sigma)
    c = x.shape[-1]
    kh = jnp.tile(g[:, None, None, None], (1, 1, 1, c))
    kw = jnp.tile(g[None, :, None, None], (1, 1, 1, c))
    pad = k // 2
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), ((pad, pad), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), ((0, 0), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return x


@register_model("ssf2020")
class ScaleSpaceFlow(CompressionModel):
    def __init__(self, num_levels: int = 5, sigma0: float = 1.5,
                 scale_field_shift: float = 1.0, *, rngs: nnx.Rngs = None,
                 **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.img_encoder = _encoder(3, rngs)
        self.img_decoder = _decoder(3, rngs)
        self.img_hyperprior = _Hyperprior(rngs)

        self.res_encoder = _encoder(3, rngs)
        self.res_decoder = _decoder(3, rngs, in_planes=384)
        self.res_hyperprior = _Hyperprior(rngs)

        self.motion_encoder = _encoder(2 * 3, rngs)
        self.motion_decoder = _decoder(2 + 1, rngs)
        self.motion_hyperprior = _Hyperprior(rngs)

        self.sigma0 = sigma0
        self.num_levels = num_levels
        self.scale_field_shift = scale_field_shift

    # -- scale-space prediction ---------------------------------------------

    def gaussian_volume(self, x, sigma: float, num_levels: int):
        """[N, H, W, C] -> [N, L, H, W, C] gaussian scale-space volume."""
        n, h, w, c = x.shape
        volume = [x]
        x_b = gaussian_blur(x, sigma)
        volume.append(x_b)
        cur = x_b
        for i in range(1, num_levels):
            n_, hh, ww, _ = cur.shape
            cur = cur.reshape(n_, hh // 2, 2, ww // 2, 2, c).mean((2, 4))
            cur = gaussian_blur(cur, sigma)
            interp = cur
            for _ in range(i):
                nh, nw = interp.shape[1] * 2, interp.shape[2] * 2
                interp = jax.image.resize(interp, (n_, nh, nw, c), "bilinear")
            volume.append(interp)
        return jnp.stack(volume, axis=1)

    def warp_volume(self, volume, flow, scale_field):
        """Trilinear warp of [N, L, H, W, C] at normalized coords
        (grid_sample semantics: align_corners=False, border padding)."""
        n, L, h, w, c = volume.shape

        # base grid (normalized [-1, 1], align_corners=False identity)
        gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * 2 / w - 1
        gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * 2 / h - 1
        base_x = jnp.broadcast_to(gx[None, None, :], (n, h, w))
        base_y = jnp.broadcast_to(gy[None, :, None], (n, h, w))

        sx = base_x + flow[..., 0]
        sy = base_y + flow[..., 1]
        sz = scale_field[..., 0]

        # to pixel coords (align_corners=False)
        ix = ((sx + 1) * w - 1) / 2
        iy = ((sy + 1) * h - 1) / 2
        iz = ((sz + 1) * L - 1) / 2

        def gather(zi, yi, xi):
            zi = jnp.clip(zi, 0, L - 1)
            yi = jnp.clip(yi, 0, h - 1)
            xi = jnp.clip(xi, 0, w - 1)
            batch = jnp.arange(n)[:, None, None]
            return volume[batch, zi, yi, xi]  # [N, H, W, C]

        x0 = jnp.floor(ix).astype(jnp.int32)
        y0 = jnp.floor(iy).astype(jnp.int32)
        z0 = jnp.floor(iz).astype(jnp.int32)
        fx = (ix - x0)[..., None]
        fy = (iy - y0)[..., None]
        fz = (iz - z0)[..., None]

        out = 0.0
        for dz in (0, 1):
            wz = (1 - fz) if dz == 0 else fz
            for dy in (0, 1):
                wy = (1 - fy) if dy == 0 else fy
                for dx in (0, 1):
                    wx = (1 - fx) if dx == 0 else fx
                    out = out + wz * wy * wx * gather(z0 + dz, y0 + dy, x0 + dx)
        return out

    def forward_prediction(self, x_ref, motion_info):
        flow = motion_info[..., :2]
        scale_field = motion_info[..., 2:]
        volume = self.gaussian_volume(x_ref, self.sigma0, self.num_levels)
        return self.warp_volume(volume, flow, scale_field)

    # -- forward/compress/decompress ----------------------------------------

    def forward_keyframe(self, x, training=True, key=None):
        y = self.img_encoder(x)
        y_hat, likelihoods = self.img_hyperprior(y, training=training, key=key)
        x_hat = self.img_decoder(y_hat)
        return x_hat, {"keyframe": likelihoods}

    def forward_inter(self, x_cur, x_ref, training=True, key=None):
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        x = jnp.concatenate([x_cur, x_ref], axis=-1)
        y_motion = self.motion_encoder(x)
        y_motion_hat, motion_lk = self.motion_hyperprior(
            y_motion, training=training, key=k1
        )
        motion_info = self.motion_decoder(y_motion_hat)
        x_pred = self.forward_prediction(x_ref, motion_info)

        x_res = x_cur - x_pred
        y_res = self.res_encoder(x_res)
        y_res_hat, res_lk = self.res_hyperprior(y_res, training=training, key=k2)

        y_combine = jnp.concatenate([y_res_hat, y_motion_hat], axis=-1)
        x_res_hat = self.res_decoder(y_combine)
        x_rec = x_pred + x_res_hat
        return x_rec, {"motion": motion_lk, "residual": res_lk}

    def __call__(self, frames, training=True, key=None):
        if not isinstance(frames, (list, tuple)):
            raise RuntimeError("Expected a list of frames")
        keys = (
            jax.random.split(key, len(frames)) if key is not None
            else [None] * len(frames)
        )
        reconstructions = []
        frames_likelihoods = []
        x_hat, lk = self.forward_keyframe(frames[0], training, keys[0])
        reconstructions.append(x_hat)
        frames_likelihoods.append(lk)
        x_ref = jax.lax.stop_gradient(x_hat)
        for i in range(1, len(frames)):
            x_ref, lk = self.forward_inter(frames[i], x_ref, training, keys[i])
            reconstructions.append(x_ref)
            frames_likelihoods.append(lk)
        return {"x_hat": reconstructions, "likelihoods": frames_likelihoods}

    def encode_keyframe(self, x):
        y = self.img_encoder(x)
        y_hat, out = self.img_hyperprior.compress(y)
        return self.img_decoder(y_hat), out

    def decode_keyframe(self, strings, shape):
        y_hat = self.img_hyperprior.decompress(strings, shape)
        return self.img_decoder(y_hat)

    def encode_inter(self, x_cur, x_ref):
        x = jnp.concatenate([x_cur, x_ref], axis=-1)
        y_motion = self.motion_encoder(x)
        y_motion_hat, out_motion = self.motion_hyperprior.compress(y_motion)
        motion_info = self.motion_decoder(y_motion_hat)
        x_pred = self.forward_prediction(x_ref, motion_info)

        x_res = x_cur - x_pred
        y_res = self.res_encoder(x_res)
        y_res_hat, out_res = self.res_hyperprior.compress(y_res)

        y_combine = jnp.concatenate([y_res_hat, y_motion_hat], axis=-1)
        x_res_hat = self.res_decoder(y_combine)
        x_rec = x_pred + x_res_hat
        return x_rec, {
            "strings": {
                "motion": out_motion["strings"],
                "residual": out_res["strings"],
            },
            "shape": {"motion": out_motion["shape"], "residual": out_res["shape"]},
        }

    def decode_inter(self, x_ref, strings, shapes):
        y_motion_hat = self.motion_hyperprior.decompress(
            strings["motion"], shapes["motion"]
        )
        motion_info = self.motion_decoder(y_motion_hat)
        x_pred = self.forward_prediction(x_ref, motion_info)

        y_res_hat = self.res_hyperprior.decompress(
            strings["residual"], shapes["residual"]
        )
        y_combine = jnp.concatenate([y_res_hat, y_motion_hat], axis=-1)
        x_res_hat = self.res_decoder(y_combine)
        return x_pred + x_res_hat

    def compress(self, frames):
        frame_strings = []
        shape_infos = []
        x_ref, out_keyframe = self.encode_keyframe(frames[0])
        frame_strings.append(out_keyframe["strings"])
        shape_infos.append(out_keyframe["shape"])
        for i in range(1, len(frames)):
            x_ref, out_inter = self.encode_inter(frames[i], x_ref)
            frame_strings.append(out_inter["strings"])
            shape_infos.append(out_inter["shape"])
        return frame_strings, shape_infos

    def decompress(self, strings, shapes):
        dec_frames = []
        x_ref = self.decode_keyframe(strings[0], shapes[0])
        dec_frames.append(x_ref)
        for i in range(1, len(strings)):
            x_ref = self.decode_inter(x_ref, strings[i], shapes[i])
            dec_frames.append(x_ref)
        return dec_frames
