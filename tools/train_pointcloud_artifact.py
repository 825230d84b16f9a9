"""Train a point-cloud codec on synthetic shapes and measure its RD point
through the REAL codec (VERDICT r3 item 7: a trained pointcloud artifact
mirroring what the image line and standalone codec have).

Model: sfu-pcc-rec-pointnet (PointNet encoder -> EntropyBottleneck ->
MLP decoder; models/pointcloud/sfu_pointnet.py). Data: synthetic shape
surfaces (spheres / boxes / cylinders with random pose+scale, jittered) —
the ShapeNet stand-in for this no-egress environment. Metric: Chamfer
distance + bits-per-point through actual compress/decompress.

CPU-friendly (small model, [B,1024,3] clouds); ~15 min for 600 steps on
one core. Writes weights/pcc_pointnet_synthetic.npz and
results/synthetic/pointcloud_pointnet.json.

Usage: python tools/train_pointcloud_artifact.py [--steps 600] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

p = argparse.ArgumentParser()
p.add_argument("--steps", type=int, default=600)
p.add_argument("--num-points", type=int, default=1024)
p.add_argument("--latent", type=int, default=256)
p.add_argument("--bs", type=int, default=16)
p.add_argument("--lmbda", type=float, default=600.0)
p.add_argument("--lr", type=float, default=1e-3)
p.add_argument("--cpu", action="store_true")
p.add_argument("--arch", default="pointnet", choices=["pointnet", "hrtzxf"])
p.add_argument("--out", default=None)
p.add_argument("--json", default=None)
args = p.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.losses.pointcloud import chamfer_distance
from flashgmm_tpu.models.pointcloud.sfu_pointnet import (
    PointNetReconstructionPccModel,
)
from flashgmm_tpu.parallel import make_train_state
from flashgmm_tpu.parallel.train import pointcloud_train_step
from flashgmm_tpu.zoo import load_npz_weights, save_npz_weights

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_cloud(rs, n):
    """One unit-cube point cloud sampled from a random shape surface."""
    kind = rs.randint(3)
    if kind == 0:  # sphere surface
        v = rs.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-9
    elif kind == 1:  # box surface
        v = rs.uniform(-1, 1, size=(n, 3))
        face = rs.randint(3, size=n)
        sign = rs.choice([-1.0, 1.0], size=n)
        v[np.arange(n), face] = sign
    else:  # cylinder surface
        theta = rs.uniform(0, 2 * np.pi, size=n)
        z = rs.uniform(-1, 1, size=n)
        v = np.stack([np.cos(theta), np.sin(theta), z], axis=1)
    # random rotation (QR of a gaussian), anisotropic scale, jitter
    q, _ = np.linalg.qr(rs.normal(size=(3, 3)))
    scale = rs.uniform(0.2, 0.45, size=3)
    v = (v @ q) * scale
    v += rs.normal(scale=0.004, size=v.shape)
    return (v + 0.5 + rs.uniform(-0.04, 0.04, size=3)).clip(0, 1)


def batch_of(rs, b, n):
    return jnp.asarray(
        np.stack([synth_cloud(rs, n) for _ in range(b)]).astype(np.float32))


if args.arch == "hrtzxf":
    from flashgmm_tpu.models.pointcloud.hrtzxf2022 import (
        DensityPreservingReconstructionPccModel,
    )

    model = DensityPreservingReconstructionPccModel(rngs=nnx.Rngs(0))
    loss_type = "hrtzxf2022"
    args.out = args.out or "weights/pcc_hrtzxf2022_synthetic.npz"
    args.json = args.json or "results/synthetic/pointcloud_hrtzxf2022.json"
else:
    model = PointNetReconstructionPccModel(
        num_points=args.num_points, latent_dim=args.latent, rngs=nnx.Rngs(0))
    loss_type = "chamfer"
    args.out = args.out or "weights/pcc_pointnet_synthetic.npz"
    args.json = args.json or "results/synthetic/pointcloud_pointnet.json"
opt_net, opt_aux = make_train_state(model, args.lr, 1e-3)

rs = np.random.RandomState(0)
key = jax.random.key(0)
t0 = time.time()
for i in range(args.steps):
    key, sub = jax.random.split(key)
    pts = batch_of(rs, args.bs, args.num_points)
    out = pointcloud_train_step(model, opt_net, opt_aux, pts, sub,
                                loss_type=loss_type, lmbda=args.lmbda)
    if i % 50 == 0:
        print(json.dumps({
            "step": i, "loss": round(float(out["loss"]), 4),
            "bpp": round(float(out.get("bpp_loss", float("nan"))), 4),
            "s_per_step": round((time.time() - t0) / (i + 1), 3)}),
            flush=True)

save_npz_weights(model, os.path.join(ROOT, args.out))
print("saved", args.out, flush=True)

# ---- held-out eval through the REAL codec -------------------------------
model.update(force=True, update_quantiles=True)
rs_eval = np.random.RandomState(999)
chamfers, bpps = [], []
for i in range(8):
    pts = batch_of(rs_eval, 1, args.num_points)
    c = model.compress(pts)
    r = model.decompress(c["strings"], c["shape"])
    def _nbits(o):
        if isinstance(o, (bytes, bytearray)):
            return len(o) * 8
        try:
            return sum(_nbits(e) for e in o)
        except TypeError:
            return 0

    nbits = _nbits(c["strings"])
    bpps.append(nbits / args.num_points)
    chamfers.append(float(chamfer_distance(r["x_hat"], pts)))
    print(f"cloud {i}: {bpps[-1]:.2f} bits/point  chamfer {chamfers[-1]:.6f}",
          flush=True)

names = {"pointnet": "flashgmm_tpu-sfu-pcc-rec-pointnet",
         "hrtzxf": "flashgmm_tpu-hrtzxf2022-pcc-rec"}
descs = {
    "pointnet": (
        f"PointNet PCC codec (latent={args.latent}) trained {args.steps} "
        "steps on synthetic shape surfaces (sphere/box/cylinder); held-out "
        "eval through the REAL EntropyBottleneck codec; "
        f"{args.num_points} points/cloud"),
    "hrtzxf": (
        "Density-preserving D-PCC codec (hrtzxf2022, 3x downsample stages) "
        f"trained {args.steps} steps on synthetic shape surfaces; held-out "
        "eval through the REAL codec (feat EB stream + learned latent-xyz "
        f"stream); {args.num_points} points/cloud"),
}
out = {
    "name": names[args.arch],
    "description": descs[args.arch],
    "results": {
        "chamfer": [float(np.mean(chamfers))],
        "bits-per-point": [float(np.mean(bpps))],
    },
    "weights": args.out,
}
os.makedirs(os.path.dirname(os.path.join(ROOT, args.json)), exist_ok=True)
with open(os.path.join(ROOT, args.json), "w") as f:
    json.dump(out, f, indent=2)
    f.write("\n")
print("wrote", args.json)
