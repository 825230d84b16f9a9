"""Point-cloud transforms (flashgmm_tpu/transforms/point.py) — parity with
compressai/transforms/point/*."""

import numpy as np

from flashgmm_tpu.transforms import (
    GeneratePositionNormals,
    NormalizeScaleV2,
    RandomPermutation,
    RandomRotateFull,
    RandomSample,
    SamplePointsV2,
    ToDict,
)
from flashgmm_tpu.transforms.point import random_rotation_matrix


def _cloud(n=100, seed=0):
    return {"pos": np.random.RandomState(seed).rand(n, 3).astype(np.float32)}


def test_to_dict_wraps_bare_array():
    out = ToDict()(np.ones((5, 3), np.float32))
    assert set(out) == {"pos"} and out["pos"].shape == (5, 3)


def test_normalize_scale():
    data = {"pos": np.float32([[0, 0, 0], [4, 0, 0], [2, 2, 0]])}
    out = NormalizeScaleV2()(data)
    assert np.abs(out["pos"]).max() <= 1.0 + 1e-6
    assert np.allclose(out["pos"].mean(0), 0, atol=1e-6)
    out2 = NormalizeScaleV2(scale_method="l2")(data)
    assert np.sqrt((out2["pos"] ** 2).sum(-1)).max() <= 1.0 + 1e-6


def test_random_permutation_preserves_set():
    data = _cloud(50)
    out = RandomPermutation(seed=0)(data)
    assert sorted(map(tuple, out["pos"])) == sorted(map(tuple, data["pos"]))


def test_rotation_is_orthonormal():
    rot = random_rotation_matrix(4)
    eye = np.einsum("bij,bkj->bik", rot, rot)
    assert np.allclose(eye, np.eye(3)[None], atol=1e-5)
    assert np.allclose(np.linalg.det(rot), 1.0, atol=1e-5)
    data = _cloud(30)
    out = RandomRotateFull(seed=1)(data)
    # distances from centroid are rotation-invariant
    d0 = np.sort(np.linalg.norm(data["pos"] - data["pos"].mean(0), axis=1))
    d1 = np.sort(np.linalg.norm(out["pos"] - out["pos"].mean(0), axis=1))
    assert np.allclose(d0, d1, atol=1e-4)


def test_random_sample_counts_and_replacement():
    data = _cloud(100)
    out = RandomSample(32, seed=0)(data)
    assert out["pos"].shape == (32, 3)
    # fewer points than requested -> sample with replacement
    out2 = RandomSample(64, seed=0)(_cloud(10))
    assert out2["pos"].shape == (64, 3)
    # static_seed -> deterministic
    a = RandomSample(16, static_seed=3)(data)["pos"]
    b = RandomSample(16, static_seed=3)(data)["pos"]
    np.testing.assert_array_equal(a, b)


def test_sample_points_on_faces():
    # unit square = two triangles in z=0 plane
    pos = np.float32([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]])
    face = np.int64([[0, 1, 2], [0, 2, 3]]).T
    out = SamplePointsV2(256, include_normals=True, seed=0)(
        {"pos": pos, "face": face}
    )
    pts = out["pos"]
    assert pts.shape == (256, 3)
    assert np.all(pts[:, :2] >= -1e-6) and np.all(pts[:, :2] <= 1 + 1e-6)
    assert np.allclose(pts[:, 2], 0, atol=1e-6)
    assert np.allclose(np.abs(out["normal"][:, 2]), 1, atol=1e-5)
    assert "face" not in out


def test_generate_normals_planar():
    # noisy plane: normals should align with +-z
    rng = np.random.RandomState(0)
    pos = np.concatenate(
        [rng.rand(200, 2), 1e-4 * rng.randn(200, 1)], axis=1
    ).astype(np.float32)
    out = GeneratePositionNormals(k=12)({"pos": pos})
    assert np.abs(out["normal"][:, 2]).min() > 0.99


def test_compute_rate_loss_breakdown():
    import jax.numpy as jnp

    from flashgmm_tpu.losses import compute_rate_loss

    lk = {"y": jnp.full((2, 4, 4, 8), 0.5), "z": jnp.full((2, 2, 2, 4), 0.25)}
    out = compute_rate_loss(lk, batch_size=2, num_pixels_per_item=64 * 64)
    # every symbol at p=0.5 costs exactly 1 bit, p=0.25 costs 2
    assert float(out["bit_y_loss"]) == 4 * 4 * 8
    assert float(out["bit_z_loss"]) == 2 * 2 * 4 * 2
    assert float(out["bit_loss"]) == float(out["bit_y_loss"] + out["bit_z_loss"])
    assert abs(float(out["bpp_loss"]) - float(out["bit_loss"]) / 4096) < 1e-6


def test_guard_nonfinite_blocks_nan_update():
    import jax
    import jax.numpy as jnp

    from flashgmm_tpu.parallel.train import _guard_nonfinite

    grads = {"a": jnp.ones((3,)), "b": jnp.full((2,), 2.0)}
    ok = _guard_nonfinite(jnp.float32(1.0), grads)
    assert float(ok["a"][0]) == 1.0
    bad_loss = _guard_nonfinite(jnp.float32(jnp.nan), grads)
    assert float(jnp.abs(bad_loss["a"]).max()) == 0.0
    bad_grad = _guard_nonfinite(
        jnp.float32(1.0), {"a": jnp.ones(3), "b": jnp.float32([jnp.inf, 0])}
    )
    assert all(float(jnp.abs(v).max()) == 0.0 for v in jax.tree.leaves(bad_grad))
