"""Density-preserving PCC building blocks (He2022, "Density-preserving Deep
Point Cloud Compression"), TPU-native re-design of
compressai/layers/pointcloud/hrtzxf2022.py (reference 1-848).

Layout is channels-LAST ([b, n, c]) throughout: per-point MLPs are plain
matmuls on the MXU, neighborhoods are gathered with take_along_axis, and
the reference's CUDA ``pointops`` kernels (furthestsampling, knnquery_heap)
become XLA-native ops (scan-based FPS, pairwise-distance ``top_k``).  All
shapes are static: point counts per level are fixed by the downsample
rates, and the density-driven point selection uses masked sorting instead
of ``nonzero`` (jit-friendly).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .pointnet import farthest_point_sample

__all__ = [
    "index_points",
    "knn_indices",
    "nearby_distance_sum",
    "select_xyzs_and_feats",
    "icosphere_directions",
    "PointTransformerLayer",
    "PositionEmbeddingLayer",
    "DensityEmbeddingLayer",
    "DownsampleLayer",
    "UpsampleLayer",
    "UpsampleNumLayer",
    "RefineLayer",
    "XyzsUpsampleLayer",
    "FeatsUpsampleLayer",
    "SubPointConv",
    "EdgeConv",
]


# ---------------------------------------------------------------------------
# Geometry primitives
# ---------------------------------------------------------------------------


def index_points(points, idx):
    """Gather rows: points [b, n, c], idx [b, m] or [b, m, k] ->
    [b, m, c] / [b, m, k, c]."""
    if idx.ndim == 2:
        return jnp.take_along_axis(points, idx[..., None], axis=1)
    b, m, k = idx.shape
    flat = jnp.take_along_axis(points, idx.reshape(b, m * k)[..., None], axis=1)
    return flat.reshape(b, m, k, points.shape[-1])


def knn_indices(query, ref, k: int):
    """k nearest neighbors of each query point among ref points.

    query [b, m, 3], ref [b, n, 3] -> idx [b, m, k] (replaces the
    reference's pointops.knnquery_heap with a dense pairwise top_k)."""
    d2 = (
        jnp.sum(query**2, -1)[..., None]
        - 2.0 * jnp.einsum("bmc,bnc->bmn", query, ref)
        + jnp.sum(ref**2, -1)[:, None, :]
    )
    _, idx = jax.lax.top_k(-d2, k)
    return idx


def nearby_distance_sum(a_xyzs, b_xyzs, k: int):
    """Sum of distances from each a-point to its collapsed point set
    C(a) ⊆ B (b-points whose nearest a-point is a, limited to a's k-NN);
    cf. reference hrtzxf2022.py:780-848.

    a_xyzs [b, m, 3], b_xyzs [b, n, 3] ->
      distance [b, m], mask [b, m, k], knn_idx [b, m, k], nn_idx [b, n]
    """
    m = a_xyzs.shape[1]
    k = min(k, b_xyzs.shape[1])  # tiny clouds: cannot have more nbrs than n
    nn_idx = knn_indices(b_xyzs, a_xyzs, 1)[..., 0]  # [b, n]: nearest a per b
    knn_idx = knn_indices(a_xyzs, b_xyzs, k)  # [b, m, k]: nearest b per a
    expect = jnp.arange(m, dtype=nn_idx.dtype)[None, :, None]
    actual = jnp.take_along_axis(nn_idx, knn_idx.reshape(nn_idx.shape[0], -1), 1)
    mask = actual.reshape(knn_idx.shape) == expect
    knn_xyzs = index_points(b_xyzs, knn_idx)  # [b, m, k, 3]
    d = jnp.linalg.norm(knn_xyzs - a_xyzs[:, :, None, :], axis=-1)
    distance = jnp.sum(d * mask.astype(d.dtype), axis=-1)
    return distance, mask, knn_idx, nn_idx


def select_xyzs_and_feats(candidate_xyzs, candidate_feats, upsample_num,
                          upsample_rate: float):
    """Density-matching subsample (reference utils.py:57-146,
    "batch_noloop" semantics, deterministic and jit-friendly).

    From each group of s candidates keep ``round(upsample_num)`` (clipped
    to [1, s]), pack the kept points into a fixed m = ceil(n *
    upsample_rate) slots (stable masked sort), and cycle-fill when fewer
    than m points were kept.

    candidate_xyzs [b, n, s, 3], candidate_feats [b, n, s, c],
    upsample_num [b, n] -> (xyzs [b, m, 3], feats [b, m, c])
    """
    b, n, s, _ = candidate_xyzs.shape
    m = math.ceil(n * upsample_rate)
    keep = jnp.round(upsample_num).astype(jnp.int32).clip(1, s)  # [b, n]
    slot = jnp.arange(s, dtype=jnp.int32)[None, None, :]
    mask = (slot < keep[:, :, None]).reshape(b, n * s)
    flat_idx = jnp.arange(n * s, dtype=jnp.int32)[None].repeat(b, 0)
    # stable sort: kept points first, original order preserved
    order = jnp.argsort(jnp.where(mask, 0, 1), axis=-1, stable=True)
    packed = jnp.take_along_axis(flat_idx, order, axis=-1)[:, :m]
    n_kept = jnp.sum(mask, axis=-1).clip(1)  # [b]
    pos = jnp.arange(m, dtype=jnp.int32)[None]
    idx = jnp.take_along_axis(packed, pos % n_kept[:, None], axis=-1)
    xyzs = index_points(candidate_xyzs.reshape(b, n * s, 3), idx)
    feats = index_points(candidate_feats.reshape(b, n * s, -1), idx)
    return xyzs, feats


def icosphere_directions(level: int = 1):
    """Unit direction vectors from a subdivided icosahedron (42 at level 1).

    Plays the role of the reference's icosahedron2sphere hypothesis basis
    (hrtzxf2022.py:694-778); constructed from the canonical golden-ratio
    icosahedron instead."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = []
    for a, b_ in [(-1, phi), (1, phi), (-1, -phi), (1, -phi)]:
        verts.append((a, b_, 0.0))
    for a, b_ in [(-1, phi), (1, phi), (-1, -phi), (1, -phi)]:
        verts.append((0.0, a, b_))
    for a, b_ in [(-1, phi), (1, phi), (-1, -phi), (1, -phi)]:
        verts.append((b_, 0.0, a))
    verts = np.asarray(verts, np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.asarray(
        [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
         (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
         (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
         (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    )
    for _ in range(level):
        new_pts = list(verts)
        cache = {}
        new_faces = []

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                p = (verts[i] + verts[j]) / 2.0
                p /= np.linalg.norm(p)
                cache[key] = len(new_pts)
                new_pts.append(p)
            return cache[key]

        for (i, j, l) in faces:
            a_, b_, c_ = midpoint(i, j), midpoint(j, l), midpoint(l, i)
            new_faces += [(i, a_, c_), (j, b_, a_), (l, c_, b_), (a_, b_, c_)]
        verts = np.asarray(new_pts)
        faces = np.asarray(new_faces)
    return verts.astype(np.float32)


# ---------------------------------------------------------------------------
# MLP helpers (1x1 convs in the reference = Linear over the channel dim)
# ---------------------------------------------------------------------------


class _MLP(nnx.Module):
    """Linear -> GroupNorm -> ReLU -> Linear over the last dim."""

    def __init__(self, cin, hidden, cout, ngroups=1, *, rngs):
        self.fc1 = nnx.Linear(cin, hidden, rngs=rngs)
        self.norm = nnx.GroupNorm(hidden, num_groups=ngroups, rngs=rngs)
        self.fc2 = nnx.Linear(hidden, cout, rngs=rngs)

    def __call__(self, x):
        h = self.fc1(x)
        # nnx.GroupNorm normalizes over the last dim's groups; inputs here
        # are [..., c], matching the reference's GroupNorm over channels
        h = jax.nn.relu(self.norm(h))
        return self.fc2(h)


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------


class PointTransformerLayer(nnx.Module):
    """Vector-attention layer (Zhao2021 Point Transformer; reference
    hrtzxf2022.py:149-215). Channels-last."""

    def __init__(self, in_fdim, out_fdim, hidden_dim, ngroups=1, *, rngs):
        self.w_qs = nnx.Linear(in_fdim, hidden_dim, rngs=rngs)
        self.w_ks = nnx.Linear(in_fdim, hidden_dim, rngs=rngs)
        self.w_vs = nnx.Linear(in_fdim, hidden_dim, rngs=rngs)
        self.conv_delta = _MLP(3, hidden_dim, hidden_dim, ngroups, rngs=rngs)
        self.conv_gamma = _MLP(hidden_dim, hidden_dim, hidden_dim, ngroups,
                               rngs=rngs)
        self.post = nnx.Linear(hidden_dim, out_fdim, rngs=rngs)

    def __call__(self, q_xyzs, k_xyzs, q_feats, k_feats, v_feats, knn_idx,
                 mask):
        # q_xyzs [b,m,3], k_xyzs [b,n,3], feats [b,*,c], knn_idx/mask [b,m,k]
        knn_xyzs = index_points(k_xyzs, knn_idx)  # [b,m,k,3]
        identity = q_feats
        query = self.w_qs(q_feats)  # [b,m,h]
        key = index_points(self.w_ks(k_feats), knn_idx)  # [b,m,k,h]
        value = index_points(self.w_vs(v_feats), knn_idx)
        pos_enc = self.conv_delta(q_xyzs[:, :, None, :] - knn_xyzs)
        attn = self.conv_gamma(query[:, :, None, :] - key + pos_enc)
        attn = attn / jnp.sqrt(jnp.asarray(key.shape[-1], attn.dtype))
        attn = jnp.where(mask[..., None], attn, jnp.finfo(attn.dtype).min)
        attn = jax.nn.softmax(attn, axis=2)
        result = jnp.sum(attn * (value + pos_enc), axis=2)  # [b,m,h]
        return self.post(result) + identity


class PositionEmbeddingLayer(nnx.Module):
    """Magnitude-direction offset embedding + self-attention reduction
    (reference hrtzxf2022.py:217-292)."""

    def __init__(self, hidden_dim, dim, ngroups=1, *, rngs):
        self.embed = _MLP(4, hidden_dim, dim, ngroups, rngs=rngs)
        self.attention = _MLP(dim, hidden_dim, dim, ngroups, rngs=rngs)

    def __call__(self, q_xyzs, k_xyzs, knn_idx, mask):
        knn_xyzs = index_points(k_xyzs, knn_idx)  # [b,m,k,3]
        offset = knn_xyzs - q_xyzs[:, :, None, :]
        dist = jnp.linalg.norm(offset, axis=-1, keepdims=True)
        direction = offset / jnp.maximum(dist, 1e-12)
        local = jnp.concatenate([direction, dist], axis=-1)  # [b,m,k,4]
        emb = self.embed(local)
        attn = self.attention(emb)
        attn = jnp.where(mask[..., None], attn, jnp.finfo(attn.dtype).min)
        attn = jax.nn.softmax(attn, axis=2)
        return jnp.sum(emb * attn, axis=2)  # [b,m,c]


class DensityEmbeddingLayer(nnx.Module):
    """Scalar local-density embedding (reference hrtzxf2022.py:294-324)."""

    def __init__(self, hidden_dim, dim, ngroups=1, *, rngs):
        self.embed = _MLP(1, hidden_dim, dim, ngroups, rngs=rngs)

    def __call__(self, downsample_num):
        return self.embed(downsample_num[..., None])  # [b,n] -> [b,n,c]


class DownsampleLayer(nnx.Module):
    """FPS downsample + density estimation + feature/position/density
    aggregation (reference hrtzxf2022.py:49-147)."""

    def __init__(self, downsample_rate, dim, hidden_dim, k=16, ngroups=1, *,
                 rngs):
        self.k = int(k)
        self.downsample_rate = float(downsample_rate)
        self.pre = nnx.Linear(dim, dim, rngs=rngs)
        self.embed_features = PointTransformerLayer(dim, dim, hidden_dim,
                                                    ngroups, rngs=rngs)
        self.embed_positions = PositionEmbeddingLayer(hidden_dim, dim,
                                                      ngroups, rngs=rngs)
        self.embed_densities = DensityEmbeddingLayer(hidden_dim, dim,
                                                     ngroups, rngs=rngs)
        self.post = nnx.Linear(dim * 3, dim, rngs=rngs)

    def __call__(self, xyzs, feats):
        # xyzs [b,n,3], feats [b,n,c]
        n = xyzs.shape[1]
        m = round(n * self.downsample_rate)
        sample_idx = farthest_point_sample(xyzs, m)  # [b,m]
        sampled_xyzs = index_points(xyzs, sample_idx)

        k = min(self.k, n)
        distance, mask, knn_idx, _ = nearby_distance_sum(sampled_xyzs, xyzs, k)
        downsample_num = jnp.sum(mask, axis=-1).astype(feats.dtype)
        mean_distance = distance / jnp.maximum(downsample_num, 1.0)

        identity = index_points(feats, sample_idx)
        f = self.pre(feats)
        sampled_f = index_points(f, sample_idx)
        emb = jnp.concatenate(
            [
                self.embed_features(sampled_xyzs, xyzs, sampled_f, f, f,
                                    knn_idx, mask),
                self.embed_positions(sampled_xyzs, xyzs, knn_idx, mask),
                self.embed_densities(downsample_num),
            ],
            axis=-1,
        )
        sampled_feats = self.post(emb) + identity
        return sampled_xyzs, sampled_feats, downsample_num, mean_distance


class EdgeConv(nnx.Module):
    """DGCNN EdgeConv: feature-space kNN grouping + max-reduced MLP over
    (f_j - f_i, f_i) pairs (reference hrtzxf2022.py:612-691)."""

    def __init__(self, in_fdim, out_fdim, hidden_dim, k=16, *, rngs):
        self.k = int(k)
        self.fc1 = nnx.Linear(2 * in_fdim, hidden_dim, rngs=rngs)
        self.fc2 = nnx.Linear(hidden_dim, out_fdim, rngs=rngs)

    def __call__(self, feats):
        # feats [b, n, c]
        n = feats.shape[1]
        k = min(self.k, n)
        knn_idx = knn_indices(feats, feats, k)  # feature-space kNN
        knn_feats = index_points(feats, knn_idx)  # [b,n,k,c]
        center = jnp.broadcast_to(feats[:, :, None, :], knn_feats.shape)
        graph = jnp.concatenate([knn_feats - center, center], axis=-1)
        h = jax.nn.relu(self.fc1(graph))
        h = self.fc2(h)
        return jnp.max(h, axis=2)  # [b,n,cout]


class SubPointConv(nnx.Module):
    """Grouped per-slice MLP for upsampling (reference
    hrtzxf2022.py:557-610): the centroid feature is sliced into g groups,
    each mapped by a shared MLP to one upsampled point's output."""

    def __init__(self, hidden_dim, k, mode, in_fdim, out_fdim, group_num, *,
                 rngs):
        self.mode = mode
        self.group_num = int(group_num)
        self.group_in = in_fdim // group_num
        self.group_out = out_fdim // group_num
        if mode == "mlp":
            self.fc1 = nnx.Linear(self.group_in, hidden_dim, rngs=rngs)
            self.fc2 = nnx.Linear(hidden_dim, self.group_out, rngs=rngs)
        elif mode == "edge_conv":
            self.edge = EdgeConv(in_fdim, out_fdim, hidden_dim, k, rngs=rngs)
        else:
            raise ValueError(f"Unknown mode: {mode}")

    def __call__(self, feats):
        # feats [b, n, cin] -> [b, n, g, group_out]
        b, n, _ = feats.shape
        g = self.group_num
        if self.mode == "mlp":
            h = feats.reshape(b, n, g, self.group_in)
            h = jax.nn.relu(self.fc1(h))
            return self.fc2(h)
        h = self.edge(feats)  # [b, n, out_fdim]
        return h.reshape(b, n, g, self.group_out)


class XyzsUpsampleLayer(nnx.Module):
    """Upsample positions: per-candidate direction = softmax-weighted sum
    of 43 icosphere hypothesis directions, scaled by a learned magnitude
    (reference hrtzxf2022.py:439-512)."""

    def __init__(self, dim, hidden_dim, k, sub_point_conv_mode, upsample_rate,
                 *, rngs):
        self.upsample_rate = int(upsample_rate)
        hyp = np.concatenate(
            [np.zeros((1, 3), np.float32), icosphere_directions(1)], axis=0
        )  # [43, 3]
        self.hypothesis = nnx.Variable(jnp.asarray(hyp))
        self.weight_nn = SubPointConv(hidden_dim, k, sub_point_conv_mode, dim,
                                      43 * upsample_rate, upsample_rate,
                                      rngs=rngs)
        self.scale_nn = SubPointConv(hidden_dim, k, sub_point_conv_mode, dim,
                                     1 * upsample_rate, upsample_rate,
                                     rngs=rngs)

    def __call__(self, xyzs, feats):
        # xyzs [b,n,3], feats [b,n,c] -> [b, n, u, 3]
        weights = jax.nn.softmax(self.weight_nn(feats), axis=-1)  # [b,n,u,43]
        directions = jnp.einsum("bnuh,hc->bnuc", weights,
                                self.hypothesis.value)
        norm = jnp.linalg.norm(directions, axis=-1, keepdims=True)
        directions = directions / jnp.maximum(norm, 1e-12)
        scales = self.scale_nn(feats)  # [b,n,u,1]
        deltas = directions * scales
        return xyzs[:, :, None, :] + deltas


class FeatsUpsampleLayer(nnx.Module):
    """Upsample features (reference hrtzxf2022.py:514-555)."""

    def __init__(self, dim, hidden_dim, k, sub_point_conv_mode, upsample_rate,
                 decompress_normal=False, *, rngs):
        self.upsample_rate = int(upsample_rate)
        self.decompress_normal = decompress_normal
        out_fdim = (3 if decompress_normal else dim) * upsample_rate
        self.feats_nn = SubPointConv(hidden_dim, k, sub_point_conv_mode, dim,
                                     out_fdim, upsample_rate, rngs=rngs)

    def __call__(self, feats):
        up = self.feats_nn(feats)  # [b, n, u, c']
        if not self.decompress_normal:
            up = up + feats[:, :, None, :]
        return up


class UpsampleLayer(nnx.Module):
    """Candidate upsampling of positions + features (reference
    hrtzxf2022.py:326-353)."""

    def __init__(self, dim, hidden_dim, k, sub_point_conv_mode, upsample_rate,
                 *, rngs):
        self.xyzs_nn = XyzsUpsampleLayer(dim, hidden_dim, k,
                                         sub_point_conv_mode, upsample_rate,
                                         rngs=rngs)
        self.feats_nn = FeatsUpsampleLayer(dim, hidden_dim, k,
                                           sub_point_conv_mode, upsample_rate,
                                           rngs=rngs)

    def __call__(self, xyzs, feats):
        return self.xyzs_nn(xyzs, feats), self.feats_nn(feats)


class UpsampleNumLayer(nnx.Module):
    """Predict how many of the u candidates to keep per centroid
    (reference hrtzxf2022.py:356-386)."""

    def __init__(self, dim, hidden_dim, upsample_rate, *, rngs):
        self.upsample_rate = int(upsample_rate)
        self.fc1 = nnx.Linear(dim, hidden_dim, rngs=rngs)
        self.fc2 = nnx.Linear(hidden_dim, 1, rngs=rngs)

    def __call__(self, feats):
        h = jax.nn.relu(self.fc1(feats))
        frac = jax.nn.sigmoid(self.fc2(h))[..., 0]  # [b, n]
        return frac * (self.upsample_rate - 1) + 1


class RefineLayer(nnx.Module):
    """Refine upsampled points with rate-1 upsample layers (reference
    hrtzxf2022.py:389-436)."""

    def __init__(self, dim, hidden_dim, k, sub_point_conv_mode,
                 decompress_normal=False, *, rngs):
        self.xyzs_nn = XyzsUpsampleLayer(dim, hidden_dim, k,
                                         sub_point_conv_mode, 1, rngs=rngs)
        self.feats_nn = FeatsUpsampleLayer(dim, hidden_dim, k,
                                           sub_point_conv_mode, 1,
                                           decompress_normal, rngs=rngs)

    def __call__(self, xyzs, feats):
        rx = self.xyzs_nn(xyzs, feats)[:, :, 0, :]  # [b, n, 3]
        rf = self.feats_nn(feats)[:, :, 0, :]
        return rx, rf
