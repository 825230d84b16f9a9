"""Density-preserving PCC family (hrtzxf2022) + pointnet2 layers.

Covers the TPU-native re-designs of the reference's pointops-based
components (layers/pointcloud/hrtzxf2022.py:49-848, pointnet2.py:66-333,
models/pointcloud/hrtzxf2022.py:58-453)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx


class TestGeometryPrimitives:
    def test_knn_indices(self):
        from flashgmm_tpu.layers.pointcloud import knn_indices

        rng = np.random.RandomState(0)
        ref = jnp.asarray(rng.rand(2, 50, 3).astype(np.float32))
        q = jnp.asarray(rng.rand(2, 10, 3).astype(np.float32))
        idx = knn_indices(q, ref, 5)
        assert idx.shape == (2, 10, 5)
        # brute-force check for one query
        d = np.linalg.norm(np.asarray(ref)[0] - np.asarray(q)[0, 0], axis=-1)
        expect = set(np.argsort(d)[:5].tolist())
        assert set(np.asarray(idx)[0, 0].tolist()) == expect

    def test_nearby_distance_sum_partition(self):
        from flashgmm_tpu.layers.pointcloud import nearby_distance_sum

        rng = np.random.RandomState(1)
        a = jnp.asarray(rng.rand(1, 8, 3).astype(np.float32))
        b = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
        dist, mask, knn_idx, nn_idx = nearby_distance_sum(a, b, 16)
        assert dist.shape == (1, 8) and mask.shape == (1, 8, 16)
        # collapsed sets are disjoint: each b point assigned at most once
        counts = np.zeros(64, int)
        m, ki = np.asarray(mask[0]), np.asarray(knn_idx[0])
        for i in range(8):
            for j in range(16):
                if m[i, j]:
                    counts[ki[i, j]] += 1
        assert counts.max() <= 1
        # mask members really are nearest to that a-point
        nn = np.asarray(nn_idx[0])
        for i in range(8):
            for j in range(16):
                if m[i, j]:
                    assert nn[ki[i, j]] == i

    def test_select_xyzs_and_feats_density(self):
        from flashgmm_tpu.layers.pointcloud import select_xyzs_and_feats

        rng = np.random.RandomState(2)
        n, s = 10, 8
        cx = jnp.asarray(rng.rand(2, n, s, 3).astype(np.float32))
        cf = jnp.asarray(rng.rand(2, n, s, 4).astype(np.float32))
        unum = jnp.asarray(np.full((2, n), 3.0, np.float32))
        xyzs, feats = select_xyzs_and_feats(cx, cf, unum, upsample_rate=3.0)
        assert xyzs.shape == (2, 30, 3) and feats.shape == (2, 30, 4)
        # with unum=3 exactly 3 slots per group are kept: the selected set
        # equals the first 3 candidates of each group
        got = set(map(tuple, np.round(np.asarray(xyzs[0]), 5).tolist()))
        expect = set(
            map(tuple, np.round(np.asarray(cx[0, :, :3]).reshape(-1, 3), 5).tolist())
        )
        assert got == expect

    def test_icosphere(self):
        from flashgmm_tpu.layers.pointcloud import icosphere_directions

        v = icosphere_directions(1)
        assert v.shape == (42, 3)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-6)


class TestPointNet2:
    def test_query_ball_point(self):
        from flashgmm_tpu.layers.pointcloud import query_ball_point

        rng = np.random.RandomState(3)
        xyz = jnp.asarray(rng.rand(1, 100, 3).astype(np.float32))
        new_xyz = xyz[:, :4]
        idx = query_ball_point(0.2, 8, xyz, new_xyz)
        assert idx.shape == (1, 4, 8)
        # every selected point lies within the radius (repeats allowed)
        sel = np.asarray(xyz[0])[np.asarray(idx[0]).reshape(-1)]
        d = np.linalg.norm(
            sel.reshape(4, 8, 3) - np.asarray(new_xyz[0])[:, None], axis=-1
        )
        assert (d <= 0.2 + 1e-6).all()

    def test_set_abstraction(self):
        from flashgmm_tpu.layers.pointcloud import PointNetSetAbstraction

        sa = PointNetSetAbstraction(
            npoint=16, radius=0.4, nsample=8, in_channel=3 + 5,
            mlp=[16, 32], rngs=nnx.Rngs(0),
        )
        rng = np.random.RandomState(4)
        xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
        feats = jnp.asarray(rng.rand(2, 64, 5).astype(np.float32))
        new_xyz, new_feats = sa(xyz, feats)
        assert new_xyz.shape == (2, 16, 3)
        assert new_feats.shape == (2, 16, 32)

    def test_group_all(self):
        from flashgmm_tpu.layers.pointcloud import PointNetSetAbstraction

        sa = PointNetSetAbstraction(
            npoint=None, radius=None, nsample=None, in_channel=3,
            mlp=[8], group_all=True, rngs=nnx.Rngs(0),
        )
        xyz = jnp.zeros((2, 32, 3))
        new_xyz, new_feats = sa(xyz)
        assert new_xyz.shape == (2, 1, 3) and new_feats.shape == (2, 1, 8)


@pytest.fixture(scope="module")
def density_model():
    from flashgmm_tpu.models.pointcloud.hrtzxf2022 import (
        DensityPreservingReconstructionPccModel,
    )

    return DensityPreservingReconstructionPccModel(
        feat_dim=8, hidden_dim=16, k=8, rngs=nnx.Rngs(0)
    )


class TestDensityPreservingPcc:
    def test_forward_and_loss(self, density_model):
        from flashgmm_tpu.losses.pointcloud import RateDistortionLossHrtzxf2022

        net = density_model
        pts = jnp.asarray(
            np.random.RandomState(0).rand(2, 81, 3).astype(np.float32)
        )
        out = net({"pos": pts}, training=True, key=jax.random.key(0))
        assert set(out["likelihoods"]) == {"latent_feat", "latent_xyz"}
        assert len(out["xyz_hat_"]) == 3
        assert out["x_hat"].ndim == 3 and out["x_hat"].shape[-1] == 3
        loss = RateDistortionLossHrtzxf2022()(out, {"pos": pts})
        assert np.isfinite(float(loss["loss"]))
        for k in ("chamfer_loss", "mean_distance_loss", "upsample_num_loss",
                  "pts_num_loss", "latent_xyzs_loss", "bpp_loss"):
            assert np.isfinite(float(loss[k])), k

    def test_grads_flow(self, density_model):
        from flashgmm_tpu.losses.pointcloud import RateDistortionLossHrtzxf2022

        net = density_model
        pts = jnp.asarray(
            np.random.RandomState(1).rand(1, 27, 3).astype(np.float32)
        )
        crit = RateDistortionLossHrtzxf2022()

        def loss_fn(m):
            out = m({"pos": pts}, training=True, key=jax.random.key(1))
            return crit(out, {"pos": pts})["loss"]

        grads = nnx.grad(loss_fn)(net)
        leaves = jax.tree.leaves(grads)
        assert leaves and all(np.all(np.isfinite(np.asarray(g))) for g in leaves)

    def test_compress_decompress(self, density_model):
        net = density_model
        net.update(update_quantiles=True)
        pts = jnp.asarray(
            np.random.RandomState(2).rand(1, 81, 3).astype(np.float32)
        )
        enc = net.compress({"pos": pts})
        assert len(enc["strings"]) == 2
        dec = net.decompress(enc["strings"], enc["shape"])
        assert dec["x_hat"].shape[-1] == 3
        # decode is deterministic
        dec2 = net.decompress(enc["strings"], enc["shape"])
        np.testing.assert_array_equal(
            np.asarray(dec["x_hat"]), np.asarray(dec2["x_hat"])
        )

    def test_float16_xyz_codec(self):
        from flashgmm_tpu.models.pointcloud.hrtzxf2022 import (
            DensityPreservingReconstructionPccModel,
        )

        net = DensityPreservingReconstructionPccModel(
            feat_dim=8, hidden_dim=16, k=8,
            latent_xyzs_codec={"mode": "float16"}, rngs=nnx.Rngs(0),
        )
        net.update(update_quantiles=True)
        pts = jnp.asarray(
            np.random.RandomState(3).rand(1, 54, 3).astype(np.float32)
        )
        out = net({"pos": pts}, training=False)
        assert np.isfinite(float(jnp.sum(out["x_hat"])))
        enc = net.compress({"pos": pts})
        dec = net.decompress(enc["strings"], enc["shape"])
        assert dec["x_hat"].shape[-1] == 3


class TestPointCloudDatasets:
    def _write_shapenet(self, root):
        import json
        import os

        os.makedirs(root / "02691156", exist_ok=True)
        os.makedirs(root / "train_test_split", exist_ok=True)
        rng = np.random.RandomState(0)
        names = []
        for i in range(3):
            pts = np.concatenate(
                [
                    rng.rand(50, 3),
                    rng.randn(50, 3),
                    rng.randint(0, 4, (50, 1)),
                ],
                axis=1,
            )
            np.savetxt(root / "02691156" / f"item{i}.txt", pts, fmt="%.5f")
            names.append(f"shape_data/02691156/item{i}")
        with open(root / "synsetoffset2category.txt", "w") as f:
            f.write("Airplane\t02691156\n")
        with open(root / "train_test_split" / "shuffled_train_file_list.json", "w") as f:
            json.dump(names, f)

    def test_shapenet(self, tmp_path):
        from flashgmm_tpu.datasets import ShapeNetCorePartDataset

        self._write_shapenet(tmp_path)
        ds = ShapeNetCorePartDataset(tmp_path, split="train", num_points=32)
        assert len(ds) == 3
        item = ds[0]
        assert item["pos"].shape == (32, 3)
        assert item["normal"].shape == (32, 3)
        assert item["semantic_index"].shape == (32,)

    def test_semantic_kitti(self, tmp_path):
        import os

        from flashgmm_tpu.datasets import SemanticKittiDataset

        d = tmp_path / "sequences" / "00" / "velodyne"
        os.makedirs(d)
        np.random.RandomState(0).rand(100, 4).astype(np.float32).tofile(
            d / "000000.bin"
        )
        ds = SemanticKittiDataset(tmp_path, split="train", num_points=64)
        assert len(ds) == 1
        assert ds[0]["pos"].shape == (64, 3)

    def test_s3dis(self, tmp_path):
        import os

        from flashgmm_tpu.datasets import S3disDataset

        room = tmp_path / "Area_1" / "office_1"
        os.makedirs(room)
        data = np.concatenate(
            [np.random.RandomState(0).rand(80, 3), np.random.RandomState(1).randint(0, 255, (80, 3))],
            axis=1,
        )
        np.savetxt(room / "office_1.txt", data, fmt="%.4f")
        ds = S3disDataset(tmp_path, split="train", num_points=48)
        assert len(ds) == 1
        item = ds[0]
        assert item["pos"].shape == (48, 3) and item["color"].shape == (48, 3)

    def test_modelnet(self, tmp_path):
        import os

        from flashgmm_tpu.datasets import ModelNetDataset

        d = tmp_path / "chair" / "train"
        os.makedirs(d)
        # minimal OFF mesh: 4 vertices, 2 triangles
        (d / "chair_0001.off").write_text(
            "OFF\n4 2 0\n0 0 0\n1 0 0\n0 1 0\n0 0 1\n3 0 1 2\n3 0 1 3\n"
        )
        ds = ModelNetDataset(tmp_path, split="train", num_points=16)
        assert len(ds) == 1
        pts = ds[0]
        pos = pts["pos"] if isinstance(pts, dict) else pts
        assert np.asarray(pos).shape == (16, 3)


class TestPccTrainStep:
    def test_hrtzxf2022_seeded_train_step(self):
        """Seeded end-to-end training step for hrtzxf2022-pcc-rec
        (VERDICT r2 item 9): forward -> RD loss -> grads -> optimizer
        update; loss finite, params actually move."""
        import optax

        from flashgmm_tpu.losses.pointcloud import RateDistortionLossHrtzxf2022
        from flashgmm_tpu.models.pointcloud.hrtzxf2022 import (
            DensityPreservingReconstructionPccModel,
        )

        net = DensityPreservingReconstructionPccModel(
            feat_dim=8, hidden_dim=16, k=8, rngs=nnx.Rngs(0)
        )
        loss_fn = RateDistortionLossHrtzxf2022(lmbda={"bpp": 1.0})
        pts = jnp.asarray(
            np.random.RandomState(7).rand(2, 54, 3).astype(np.float32)
        )
        opt = nnx.Optimizer(net, optax.adam(1e-3), wrt=nnx.Param)

        def loss(model):
            out = model({"pos": pts}, training=True, key=jax.random.key(0))
            return loss_fn(out, {"pos": pts})["loss"]

        before = jax.tree.map(
            lambda v: np.asarray(v).copy(), nnx.state(net, nnx.Param)
        )
        l0, grads = nnx.value_and_grad(loss)(net)
        assert np.isfinite(float(l0))
        gnorm = optax.global_norm(nnx.state(grads, nnx.Param))
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0
        opt.update(net, grads)
        after = nnx.state(net, nnx.Param)
        moved = jax.tree_util.tree_leaves(
            jax.tree.map(
                lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                before, after,
            )
        )
        assert max(moved) > 0


class TestPlyLoader:
    def test_binary_ply_with_extra_props(self, tmp_path):
        import struct

        from flashgmm_tpu.datasets.pointcloud import load_point_cloud

        pts = np.random.RandomState(0).rand(50, 3).astype(np.float32)
        p = tmp_path / "bin.ply"
        with open(p, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(b"element vertex 50\nproperty float x\nproperty float y\n"
                    b"property float z\nproperty uchar intensity\n")
            f.write(b"element face 0\n"
                    b"property list uchar int vertex_indices\nend_header\n")
            for i in range(50):
                f.write(struct.pack("<fffB", *pts[i], i % 256))
        np.testing.assert_allclose(load_point_cloud(p), pts, rtol=1e-6)
