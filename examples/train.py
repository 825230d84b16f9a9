"""Training entry point (reference: train_ckbd_gmm.py / train_elic_gmm.py).

Data-parallel over all local devices via the ("data", "spatial") mesh; the
net/aux optimizer split, NaN-batch skipping, gradient clipping, MultiStep
LR decay, periodic eval, and latest/best checkpointing follow the
reference's training recipe (train_ckbd_gmm.py:143-275, 474-597).

Usage:
    python examples/train.py --model cheng2020-anchor-checkerboard-gmm \
        --dataset /path/to/imagefolder -n 192 -K 4 --lambda 0.01 --epochs 200
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="cheng2020-anchor-checkerboard-gmm")
    p.add_argument("-d", "--dataset", type=str, required=True)
    p.add_argument("-n", "--num-channels", type=int, default=192)
    p.add_argument("-m", "--latent-channels", type=int, default=320)
    p.add_argument("-K", "--mixtures", type=int, default=4)
    p.add_argument("-e", "--epochs", type=int, default=200)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--lambda", dest="lmbda", type=float, default=1e-2)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--patch-size", type=int, default=256)
    p.add_argument("--clip_max_norm", type=float, default=1.0)
    p.add_argument("--lr-milestones", type=int, nargs="*", default=[150, 180])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--checkpoint-dir", type=str, default="./checkpoints")
    p.add_argument("--checkpoint", type=str, help="resume from checkpoint")
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--probe-dir", type=str, default=None,
                   help="directory of full-size images for the periodic RD "
                        "probe (the reference's per-epoch Kodak eval)")
    p.add_argument("--probe-every", type=int, default=1)
    p.add_argument("--logdir", type=str, default=None,
                   help="TensorBoard/scalars dir (default: checkpoint-dir/tb)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import nnx
    from jax.sharding import NamedSharding, PartitionSpec as P

    from flashgmm_tpu.datasets import BatchLoader, ImageFolder
    from flashgmm_tpu.parallel import make_mesh, make_train_state
    from flashgmm_tpu.parallel.train import data_parallel_train_step
    from flashgmm_tpu.registry import MODELS
    from flashgmm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from flashgmm_tpu.utils.logging import ScalarWriter, rd_probe

    np.random.seed(args.seed)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    assert args.batch_size % max(n_dev, 1) == 0, "batch must divide devices"

    import inspect

    model_cls = MODELS[args.model]
    sig = inspect.signature(model_cls.__init__)
    kwargs = {}
    if "N" in sig.parameters:
        kwargs["N"] = args.num_channels
    if "M" in sig.parameters:
        kwargs["M"] = args.latent_channels
    if "K" in sig.parameters:
        kwargs["K"] = args.mixtures
    model = model_cls(**kwargs, rngs=nnx.Rngs(args.seed))
    opt_net, opt_aux = make_train_state(
        model, args.learning_rate, args.aux_learning_rate, args.clip_max_norm
    )

    start_epoch = 0
    best_loss = float("inf")
    if args.checkpoint:
        meta = load_checkpoint(args.checkpoint, model, opt_net, opt_aux)
        start_epoch = meta.get("epoch", 0) + 1
        best_loss = meta.get("best_loss", best_loss)

    train_ds = ImageFolder(args.dataset, patch_size=args.patch_size, split="train")
    test_ds = ImageFolder(args.dataset, patch_size=args.patch_size, split="test")
    loader = BatchLoader(
        train_ds, args.batch_size, num_workers=args.num_workers, seed=args.seed
    )

    ckpt_dir = Path(args.checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    log_path = ckpt_dir / "train_log.jsonl"
    writer = ScalarWriter(args.logdir or ckpt_dir / "tb")
    probe_images = None
    if args.probe_dir:
        from PIL import Image

        from flashgmm_tpu.datasets.image import IMG_EXTENSIONS

        probe_images = [
            np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
            for f in sorted(Path(args.probe_dir).iterdir())
            if f.suffix.lower() in IMG_EXTENSIONS
        ]

    key = jax.random.key(args.seed)
    lr_scale = 1.0

    for epoch in range(start_epoch, args.epochs):
        if epoch in args.lr_milestones:
            lr_scale *= 0.1  # MultiStepLR(gamma=0.1) equivalent
            opt_net, opt_aux = make_train_state(
                model, args.learning_rate * lr_scale, args.aux_learning_rate,
                args.clip_max_norm,
            )

        t0 = time.time()
        n_steps = 0
        agg = {}
        for batch in loader:
            key, sub = jax.random.split(key)
            x = jnp.asarray(batch)
            if mesh is not None:
                x = jax.device_put(
                    x, NamedSharding(mesh, P("data", None, None, None))
                )
            out = data_parallel_train_step(
                model, opt_net, opt_aux, x, sub, args.lmbda
            )
            loss = float(out["loss"])
            if not np.isfinite(loss):  # log only; the step already zeroed the update
                continue
            n_steps += 1
            for k, v in out.items():
                agg[k] = agg.get(k, 0.0) + float(v)

        metrics = {k: v / max(n_steps, 1) for k, v in agg.items()}
        metrics.update(epoch=epoch, steps=n_steps, seconds=time.time() - t0)

        if epoch % args.eval_every == 0:
            metrics["test_loss"] = evaluate(model, test_ds, args, key)

        if probe_images and epoch % args.probe_every == 0:
            metrics.update(rd_probe(model, probe_images, args.lmbda))

        metrics["lr"] = args.learning_rate * lr_scale
        writer.add_scalars(metrics, epoch, prefix="train/")
        writer.flush()
        with open(log_path, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        print(json.dumps(metrics))

        save_checkpoint(ckpt_dir / "latest", model, opt_net, opt_aux,
                        {"epoch": epoch, "best_loss": best_loss})
        loss_now = metrics.get("test_loss", metrics.get("loss", np.inf))
        if loss_now < best_loss:
            best_loss = loss_now
            save_checkpoint(ckpt_dir / "best", model, opt_net, opt_aux,
                            {"epoch": epoch, "best_loss": best_loss})
        if epoch % 20 == 0:
            save_checkpoint(ckpt_dir / f"epoch_{epoch}", model, opt_net,
                            opt_aux, {"epoch": epoch, "best_loss": best_loss})


def evaluate(model, dataset, args, key):
    import jax
    import jax.numpy as jnp

    from flashgmm_tpu.losses import rate_distortion_loss

    total = 0.0
    n = min(len(dataset), 16)
    for i in range(n):
        x = jnp.asarray(dataset[i])[None]
        out = model(x, training=False)
        total += float(rate_distortion_loss(out, x, args.lmbda)["loss"])
    return total / max(n, 1)


if __name__ == "__main__":
    main(sys.argv[1:])
