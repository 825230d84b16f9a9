"""Point-cloud datasets (cf. compressai/datasets/pointcloud/*: shapenet,
modelnet, s3dis, semantic-kitti).

Self-contained loaders: .npy / .npz / ascii .ply / .off point files under a
split directory, sampled to a fixed point count.
"""

import random
from pathlib import Path

import numpy as np

PC_EXTENSIONS = (".npy", ".npz", ".ply", ".off", ".txt", ".xyz")


def load_point_cloud(path):
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".npy":
        pts = np.load(path)
    elif suffix == ".npz":
        data = np.load(path)
        pts = data[list(data.keys())[0]]
    elif suffix == ".ply":
        pts = _load_ascii_ply(path)
    elif suffix == ".off":
        pts = _load_off(path)
    else:  # .txt / .xyz: whitespace-separated rows
        pts = np.loadtxt(path, dtype=np.float32)
    return np.asarray(pts[:, :3], np.float32)


def _load_ascii_ply(path):
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(
            int(h.split()[-1]) for h in header if h.startswith("element vertex")
        )
        if any("binary" in h for h in header):
            raise ValueError("binary PLY unsupported; convert to ascii/npy")
        rows = [f.readline().split()[:3] for _ in range(n)]
    return np.asarray(rows, np.float32)


def _load_off(path):
    with open(path) as f:
        first = f.readline().strip()
        counts = f.readline().split() if first == "OFF" else first[3:].split()
        n = int(counts[0])
        rows = [f.readline().split()[:3] for _ in range(n)]
    return np.asarray(rows, np.float32)


def sample_points(pts, num_points: int, rng=None):
    rng = rng or random
    n = pts.shape[0]
    if n >= num_points:
        idx = rng.sample(range(n), num_points)
    else:
        idx = [rng.randrange(n) for _ in range(num_points)]
    return pts[np.asarray(idx)]


def normalize_unit_cube(pts):
    mins = pts.min(0)
    maxs = pts.max(0)
    scale = max(float((maxs - mins).max()), 1e-9)
    return (pts - mins) / scale


class PointCloudFolder:
    """root/{split}/ *.npy|*.ply|... -> [num_points, 3] float32 in [0,1]."""

    def __init__(self, root, split="train", num_points=1024, normalize=True,
                 seed=0):
        splitdir = Path(root) / split
        if not splitdir.is_dir():
            raise RuntimeError(f'Invalid directory "{splitdir}"')
        self.samples = sorted(
            f for f in splitdir.rglob("*") if f.suffix.lower() in PC_EXTENSIONS
        )
        self.num_points = num_points
        self.normalize = normalize
        self._rng = random.Random(seed)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        pts = load_point_cloud(self.samples[index])
        if self.normalize:
            pts = normalize_unit_cube(pts)
        return sample_points(pts, self.num_points, self._rng)
