"""Density-preserving deep point-cloud compression (He2022 CVPR,
"Density-preserving Deep Point Cloud Compression"; reference
compressai/models/pointcloud/hrtzxf2022.py:58-453).

TPU-native re-design (channels-last, static shapes, XLA-native FPS/kNN —
see flashgmm_tpu/layers/pointcloud/hrtzxf2022.py).  Architecture:

  encoder: 3 x DownsampleLayer (FPS to rate*n, density estimate, point-
           transformer + position + density embedding aggregation)
  latents: feature vectors (EB-coded) + latent xyzs (learned analysis/
           synthesis around an EB, or raw float16)
  decoder: 3 x [UpsampleLayer (candidate points from icosphere-direction
           mixtures) -> UpsampleNumLayer (local density) ->
           select_xyzs_and_feats (density-matching subsample) ->
           RefineLayer]

A FoldingNet-style model is kept as the lightweight alternative
(``folding-pcc-rec``).
"""

import jax.numpy as jnp
import numpy as np
from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck
from flashgmm_tpu.latent_codecs import EntropyBottleneckLatentCodec
from flashgmm_tpu.layers.pointcloud import PointNetSetMLP, SharedMLP
from flashgmm_tpu.layers.pointcloud.hrtzxf2022 import (
    DownsampleLayer,
    EdgeConv,
    RefineLayer,
    UpsampleLayer,
    UpsampleNumLayer,
    nearby_distance_sum,
    select_xyzs_and_feats,
)
from flashgmm_tpu.registry import register_model

from ..base import CompressionModel


class XyzsLatentCodec(nnx.Module):
    """Latent-position codec (reference hrtzxf2022.py:227-297): learned
    analysis/synthesis around an EB, or a raw float16 passthrough."""

    def __init__(self, dim, hidden_dim, k, ngroups=1, mode="learned",
                 conv_mode="mlp", *, rngs):
        self.mode = mode
        if mode == "learned":
            if conv_mode == "edge_conv":
                self.analysis = EdgeConv(3, dim, hidden_dim, k, rngs=rngs)
                self.synthesis = EdgeConv(dim, 3, hidden_dim, k, rngs=rngs)
            else:
                self.analysis = SharedMLP([3, hidden_dim, dim],
                                          final_act=False, rngs=rngs)
                self.synthesis = SharedMLP([dim, hidden_dim, 3],
                                           final_act=False, rngs=rngs)
            self.entropy_bottleneck = EntropyBottleneck(dim, rngs=rngs)

    def __call__(self, latent_xyzs, training=True, key=None):
        if self.mode == "learned":
            z = self.analysis(latent_xyzs)  # [b, m, d]
            z_hat, z_lk = self.entropy_bottleneck(
                z[:, :, None, :], training=training, key=key
            )
            y_hat = self.synthesis(z_hat[:, :, 0, :])
            return {"likelihoods": {"y": z_lk}, "y_hat": y_hat}
        lk = jnp.full(latent_xyzs.shape, 2.0**-16, latent_xyzs.dtype)
        y_hat = latent_xyzs.astype(jnp.float16).astype(jnp.float32)
        return {"likelihoods": {"y": lk}, "y_hat": y_hat}

    def compress(self, latent_xyzs):
        if self.mode == "learned":
            z = self.analysis(latent_xyzs)[:, :, None, :]
            shape = z.shape[1:3]
            strings = self.entropy_bottleneck.compress(z)
            z_hat = self.entropy_bottleneck.decompress(strings, shape)
            y_hat = self.synthesis(z_hat[:, :, 0, :])
            return {"strings": [strings], "shape": shape, "y_hat": y_hat}
        z16 = np.asarray(latent_xyzs, np.float16)
        strings = [z16[i].tobytes() for i in range(z16.shape[0])]
        y_hat = jnp.asarray(z16.astype(np.float32))
        return {"strings": [strings], "shape": latent_xyzs.shape[1:],
                "y_hat": y_hat}

    def decompress(self, strings, shape):
        (z_strings,) = strings
        if self.mode == "learned":
            z_hat = self.entropy_bottleneck.decompress(z_strings, shape)
            return {"y_hat": self.synthesis(z_hat[:, :, 0, :])}
        arrs = [
            np.frombuffer(s, np.float16).reshape(shape).astype(np.float32)
            for s in z_strings
        ]
        return {"y_hat": jnp.asarray(np.stack(arrs))}


class _Encoder(nnx.Module):
    def __init__(self, downsample_rate, dim, hidden_dim, k, ngroups, *, rngs):
        self.layers = nnx.List(
            [
                DownsampleLayer(r, dim, hidden_dim, k, ngroups, rngs=rngs)
                for r in downsample_rate
            ]
        )

    def __call__(self, xyzs, feats):
        gt_xyzs_, gt_dnums_, gt_mdis_ = [], [], []
        for layer in self.layers:
            gt_xyzs_.append(xyzs)
            xyzs, feats, dnum, mdis = layer(xyzs, feats)
            gt_dnums_.append(dnum)
            gt_mdis_.append(mdis)
        return gt_xyzs_, gt_dnums_, gt_mdis_, xyzs, feats


class _Decoder(nnx.Module):
    def __init__(self, downsample_rate, candidate_upsample_rate, dim,
                 hidden_dim, k, sub_point_conv_mode, compress_normal, *,
                 rngs):
        self.k = k
        self.num_layers = len(downsample_rate)
        self.downsample_rate = list(downsample_rate)
        self.upsample_layers = nnx.List(
            [
                UpsampleLayer(dim, hidden_dim, k, sub_point_conv_mode, u,
                              rngs=rngs)
                for u in candidate_upsample_rate
            ]
        )
        self.upsample_num_layers = nnx.List(
            [
                UpsampleNumLayer(dim, hidden_dim, u, rngs=rngs)
                for u in candidate_upsample_rate
            ]
        )
        self.refine_layers = nnx.List(
            [
                RefineLayer(dim, hidden_dim, k, sub_point_conv_mode,
                            compress_normal and i == self.num_layers - 1,
                            rngs=rngs)
                for i in range(self.num_layers)
            ]
        )

    def __call__(self, xyzs, feats):
        latent_xyzs = xyzs
        xyzs_hat_, unums_hat_ = [], []
        for i in range(self.num_layers):
            cand_xyzs, cand_feats = self.upsample_layers[i](xyzs, feats)
            unum = self.upsample_num_layers[i](feats)
            rate = 1.0 / self.downsample_rate[self.num_layers - i - 1]
            xyzs, feats = select_xyzs_and_feats(cand_xyzs, cand_feats, unum,
                                                rate)
            xyzs, feats = self.refine_layers[i](xyzs, feats)
            xyzs_hat_.append(xyzs)
            unums_hat_.append(unum)
        mdis_hat_ = self._pred_mdis([latent_xyzs, *xyzs_hat_], unums_hat_)
        return xyzs_hat_, unums_hat_, mdis_hat_, feats

    def _pred_mdis(self, xyzs_hat_, unums_hat_):
        mdis_hat_ = []
        for prev, curr, unum in zip(xyzs_hat_[:-1], xyzs_hat_[1:], unums_hat_):
            distance, _, _, _ = nearby_distance_sum(prev, curr, self.k)
            mdis_hat_.append(distance / unum)
        return mdis_hat_


@register_model("hrtzxf2022-pcc-rec")
class DensityPreservingReconstructionPccModel(CompressionModel):
    """Full density-preserving PCC model (reference hrtzxf2022.py:58-223).

    Input: ``{"pos": [b, n, 3]}`` or a bare ``[b, n, 3]`` array.
    """

    def __init__(self, downsample_rate=(1 / 3, 1 / 3, 1 / 3),
                 candidate_upsample_rate=(8, 8, 8), in_dim=3, feat_dim=8,
                 hidden_dim=64, k=16, ngroups=1, sub_point_conv_mode="mlp",
                 compress_normal=False, latent_xyzs_codec=None, *,
                 rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.compress_normal = bool(compress_normal)
        self.pre_conv = SharedMLP([in_dim, hidden_dim, feat_dim],
                                  final_act=False, rngs=rngs)
        self.encoder = _Encoder(downsample_rate, feat_dim, hidden_dim, k,
                                ngroups, rngs=rngs)
        self.decoder = _Decoder(downsample_rate, candidate_upsample_rate,
                                feat_dim, hidden_dim, k, sub_point_conv_mode,
                                compress_normal, rngs=rngs)
        self.latent_codec = nnx.Dict(
            feat=EntropyBottleneckLatentCodec(channels=feat_dim, rngs=rngs),
            xyz=XyzsLatentCodec(feat_dim, hidden_dim, k, ngroups,
                                **(latent_xyzs_codec or {}), rngs=rngs),
        )

    def _prepare_input(self, input):
        if isinstance(input, dict):
            xyzs = input["pos"]
            normals = input.get("normal") if self.compress_normal else None
        else:
            xyzs, normals = input, None
        feats = xyzs if normals is None else jnp.concatenate(
            [xyzs, normals], axis=-1
        )
        return xyzs, normals, feats

    def __call__(self, input, training: bool = True, key=None):
        xyzs, gt_normals, feats = self._prepare_input(input)
        feats = self.pre_conv(feats)
        gt_xyzs_, gt_dnums_, gt_mdis_, latent_xyzs, latent_feats = (
            self.encoder(xyzs, feats)
        )

        feats_out = self.latent_codec["feat"](
            latent_feats[:, :, None, :], training=training, key=key
        )
        latent_feats_hat = feats_out["y_hat"][:, :, 0, :]

        xyzs_out = self.latent_codec["xyz"](latent_xyzs, training=training,
                                            key=key)
        latent_xyzs_hat = xyzs_out["y_hat"]

        xyzs_hat_, unums_hat_, mdis_hat_, feats_hat = self.decoder(
            latent_xyzs_hat, latent_feats_hat
        )

        return {
            "x_hat": xyzs_hat_[-1],
            "xyz_hat_": xyzs_hat_,
            "latent_xyz_hat": latent_xyzs_hat,
            "feat_hat": feats_hat,
            "upsample_num_hat_": unums_hat_,
            "mean_distance_hat_": mdis_hat_,
            "gt_xyz_": gt_xyzs_,
            "gt_latent_xyz": latent_xyzs,
            "gt_normal": gt_normals,
            "gt_downsample_num_": gt_dnums_,
            "gt_mean_distance_": gt_mdis_,
            "likelihoods": {
                "latent_feat": feats_out["likelihoods"]["y"],
                "latent_xyz": xyzs_out["likelihoods"]["y"],
            },
        }

    def compress(self, input):
        xyzs, _, feats = self._prepare_input(input)
        feats = self.pre_conv(feats)
        _, _, _, latent_xyzs, latent_feats = self.encoder(xyzs, feats)
        feats_out = self.latent_codec["feat"].compress(
            latent_feats[:, :, None, :]
        )
        xyzs_out = self.latent_codec["xyz"].compress(latent_xyzs)
        return {
            "strings": [feats_out["strings"], xyzs_out["strings"]],
            "shape": [feats_out["shape"], xyzs_out["shape"]],
        }

    def decompress(self, strings, shape):
        assert isinstance(strings, list) and len(strings) == 2
        feats_out = self.latent_codec["feat"].decompress(strings[0], shape[0])
        latent_feats_hat = feats_out["y_hat"][:, :, 0, :]
        xyzs_out = self.latent_codec["xyz"].decompress(strings[1], shape[1])
        xyzs_hat_, _, _, feats_hat = self.decoder(
            xyzs_out["y_hat"], latent_feats_hat
        )
        return {"x_hat": xyzs_hat_[-1], "feat_hat": feats_hat}


class FoldingDecoder(nnx.Module):
    """FoldingNet-style decoder: deform a fixed 2D grid into 3D, twice."""

    def __init__(self, latent_dim, num_points, *, rngs):
        self.num_points = num_points
        side = int(np.ceil(np.sqrt(num_points)))
        u, v = np.meshgrid(
            np.linspace(0, 1, side), np.linspace(0, 1, side)
        )
        grid = np.stack([u.ravel(), v.ravel()], axis=-1)[:num_points]
        self.grid = nnx.Variable(jnp.asarray(grid.astype(np.float32)))
        self.fold1 = SharedMLP([latent_dim + 2, 256, 128, 3], final_act=False,
                               rngs=rngs)
        self.fold2 = SharedMLP([latent_dim + 3, 256, 128, 3], final_act=False,
                               rngs=rngs)

    def __call__(self, latent):
        b = latent.shape[0]
        grid = jnp.broadcast_to(self.grid.value[None], (b, self.num_points, 2))
        lat = jnp.broadcast_to(
            latent[:, None, :], (b, self.num_points, latent.shape[-1])
        )
        p1 = self.fold1(jnp.concatenate([lat, grid], axis=-1))
        p2 = self.fold2(jnp.concatenate([lat, p1], axis=-1))
        return p2


@register_model("folding-pcc-rec")
class FoldingPccModel(CompressionModel):
    """Lightweight PointNet-encoder + FoldingNet-decoder PCC model."""

    def __init__(self, num_points: int = 1024, latent_dim: int = 512,
                 *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.num_points = int(num_points)
        self.latent_dim = int(latent_dim)
        self.g_a = PointNetSetMLP(
            [3, 64, 128, 256, latent_dim], rngs=rngs
        )
        self.g_s = FoldingDecoder(latent_dim, num_points, rngs=rngs)
        self.entropy_bottleneck = EntropyBottleneck(latent_dim, rngs=rngs)

    def _bottleneck(self, y, training, key):
        y4 = y[:, None, None, :]
        y_hat, lk = self.entropy_bottleneck(y4, training=training, key=key)
        return y_hat[:, 0, 0, :], lk

    def __call__(self, points, training: bool = True, key=None):
        if isinstance(points, dict):
            points = points["pos"]
        y = self.g_a(points)
        y_hat, y_likelihoods = self._bottleneck(y, training, key)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods}}

    def compress(self, points):
        if isinstance(points, dict):
            points = points["pos"]
        y = self.g_a(points)
        strings = self.entropy_bottleneck.compress(y[:, None, None, :])
        return {"strings": [strings], "shape": (1, 1)}

    def decompress(self, strings, shape):
        y_hat = self.entropy_bottleneck.decompress(strings[0], shape)[:, 0, 0, :]
        return {"x_hat": self.g_s(y_hat)}


# Backwards-compatible alias (round-1 name for the folding model).
Hrtzxf2022PccModel = FoldingPccModel
