"""Point-cloud compression training entry point.

Equivalent of the reference's examples/train_pointcloud.py:240-373:
point-cloud dataset (folder / shapenet / modelnet), registered PCC model,
Chamfer or density-preserving (hrtzxf2022) RD loss, net/aux split,
checkpointing.

Usage:
    python examples/train_pointcloud.py -d /path/to/clouds \
        --model sfu-pcc-rec-pointnet --num-points 1024 --lambda 1.0
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

DATASETS = {
    "folder": "PointCloudFolder",
    "shapenet": "ShapeNetCorePartDataset",
    "modelnet": "ModelNetDataset",
    "s3dis": "S3disDataset",
    "semantic-kitti": "SemanticKittiDataset",
}


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-d", "--dataset", type=str, required=True)
    p.add_argument("--dataset-type", choices=sorted(DATASETS), default="folder")
    p.add_argument("--model", default="sfu-pcc-rec-pointnet")
    p.add_argument("--num-points", type=int, default=1024)
    p.add_argument("--loss", choices=("chamfer", "hrtzxf2022"), default=None,
                   help="default: hrtzxf2022 for the hrtzxf models, else chamfer")
    p.add_argument("-e", "--epochs", type=int, default=50)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--lambda", dest="lmbda", type=float, default=1.0)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--clip_max_norm", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--checkpoint-dir", type=str, default="./checkpoints_pcc")
    p.add_argument("--checkpoint", type=str, help="resume from checkpoint")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from flashgmm_tpu import datasets as ds
    from flashgmm_tpu.datasets import BatchLoader
    from flashgmm_tpu.parallel import make_train_state
    from flashgmm_tpu.parallel.train import pointcloud_train_step
    from flashgmm_tpu.registry import MODELS
    from flashgmm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    np.random.seed(args.seed)
    model = MODELS[args.model](
        num_points=args.num_points, rngs=nnx.Rngs(args.seed)
    )
    loss_type = args.loss or (
        "hrtzxf2022" if "hrtzxf" in args.model else "chamfer"
    )
    opt_net, opt_aux = make_train_state(
        model, args.learning_rate, args.aux_learning_rate, args.clip_max_norm
    )
    start_epoch = 0
    if args.checkpoint:
        meta = load_checkpoint(args.checkpoint, model, opt_net, opt_aux)
        start_epoch = int(meta.get("epoch", -1)) + 1
        print(f"resumed from {args.checkpoint} at epoch {start_epoch}")

    class _PosOnly:
        """Dict-yielding datasets (shapenet/s3dis/kitti) carry positions
        under "pos"; the rec models train on positions alone."""

        def __init__(self, base):
            self.base = base

        def __len__(self):
            return len(self.base)

        def __getitem__(self, i):
            item = self.base[i]
            return item["pos"] if isinstance(item, dict) else item

    ds_cls = getattr(ds, DATASETS[args.dataset_type])
    dataset = _PosOnly(
        ds_cls(args.dataset, split="train", num_points=args.num_points,
               seed=args.seed)
    )
    loader = BatchLoader(
        dataset, args.batch_size, shuffle=True, num_workers=args.num_workers,
        seed=args.seed,
    )

    ckdir = Path(args.checkpoint_dir)
    ckdir.mkdir(parents=True, exist_ok=True)
    key = jax.random.key(args.seed)
    best = float("inf")

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        losses = []
        for step, batch in enumerate(loader):
            if args.steps_per_epoch and step >= args.steps_per_epoch:
                break
            pts = jnp.asarray(batch)
            key, sub = jax.random.split(key)
            out = pointcloud_train_step(
                model, opt_net, opt_aux, pts, sub,
                loss_type=loss_type, lmbda=args.lmbda,
            )
            loss = float(out["loss"])
            if not np.isfinite(loss):  # log only; the step already zeroed the update
                print(f"  step {step}: non-finite loss, skipped")
                continue
            losses.append(loss)
            if step % 50 == 0:
                extras = ", ".join(
                    f"{k} {float(v):.4f}" for k, v in out.items() if k != "loss"
                )
                print(f"  epoch {epoch} step {step}: loss {loss:.4f} ({extras})")
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        print(f"epoch {epoch}: loss {mean_loss:.4f} in {time.time()-t0:.0f}s")
        save_checkpoint(ckdir / "latest", model, opt_net, opt_aux,
                        meta={"epoch": epoch, "loss": mean_loss})
        if mean_loss < best:
            best = mean_loss
            save_checkpoint(ckdir / "best", model, opt_net, opt_aux,
                            meta={"epoch": epoch, "loss": mean_loss})
    return 0


if __name__ == "__main__":
    sys.exit(main())
