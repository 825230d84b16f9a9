"""Video training entry point (ssf2020 scale-space flow).

Equivalent of the reference's examples/train_video.py:300-475: Vimeo90k
triplets/septuplets, multi-frame RD loss (mean frame distortion + total
rate), net/aux optimizer split, NaN-skip, clip, checkpointing. GOP length
is fixed per run (static frame count keeps one compiled step).

Usage:
    python examples/train_video.py -d /path/to/vimeo90k --tuplet 3 \
        --lambda 1e-2 --epochs 20
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-d", "--dataset", type=str, required=True,
                   help="vimeo90k root (sequences/ + sep_trainlist.txt)")
    p.add_argument("--tuplet", type=int, default=3, help="frames per sample")
    p.add_argument("-e", "--epochs", type=int, default=20)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--lambda", dest="lmbda", type=float, default=1e-2)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--patch-size", type=int, default=256)
    p.add_argument("--clip_max_norm", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--checkpoint-dir", type=str, default="./checkpoints_video")
    p.add_argument("--checkpoint", type=str, help="resume from checkpoint")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="cap steps per epoch (debug)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from flashgmm_tpu.datasets import BatchLoader, Vimeo90kDataset
    from flashgmm_tpu.models.video.google import ScaleSpaceFlow
    from flashgmm_tpu.parallel import make_train_state
    from flashgmm_tpu.parallel.train import video_train_step
    from flashgmm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    np.random.seed(args.seed)
    model = ScaleSpaceFlow(rngs=nnx.Rngs(args.seed))
    opt_net, opt_aux = make_train_state(
        model, args.learning_rate, args.aux_learning_rate, args.clip_max_norm
    )
    start_epoch = 0
    if args.checkpoint:
        meta = load_checkpoint(args.checkpoint, model, opt_net, opt_aux)
        start_epoch = int(meta.get("epoch", -1)) + 1
        print(f"resumed from {args.checkpoint} at epoch {start_epoch}")

    dataset = Vimeo90kDataset(
        args.dataset, split="train", tuplet=args.tuplet,
        patch_size=args.patch_size,
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
        for step, batch in enumerate(loader):  # [B, T, H, W, 3]
            if args.steps_per_epoch and step >= args.steps_per_epoch:
                break
            frames = tuple(
                jnp.asarray(batch[:, t]) for t in range(batch.shape[1])
            )
            key, sub = jax.random.split(key)
            out = video_train_step(
                model, opt_net, opt_aux, frames, sub, lmbda=args.lmbda
            )
            loss = float(out["loss"])
            if not np.isfinite(loss):  # log only; the step already zeroed the update
                print(f"  step {step}: non-finite loss, skipped")
                continue
            losses.append(loss)
            if step % 50 == 0:
                print(
                    f"  epoch {epoch} step {step}: loss {loss:.4f} "
                    f"(bpp {float(out['bpp_loss']):.4f}, "
                    f"mse {float(out['mse_loss']):.6f})"
                )
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
