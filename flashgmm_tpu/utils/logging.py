"""Training observability (reference train_ckbd_gmm.py:66-114,198-211,487):
TensorBoard scalars + a periodic full-image RD probe (the reference's
per-epoch Kodak evaluation).
"""

import json
from pathlib import Path

__all__ = ["ScalarWriter", "rd_probe"]


class ScalarWriter:
    """TensorBoard SummaryWriter when available, always mirrored to a
    JSONL file (machine-readable, no-dependency fallback)."""

    def __init__(self, logdir):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.logdir / "scalars.jsonl", "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=str(self.logdir))
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step)})
            + "\n"
        )

    def add_scalars(self, scalars: dict, step: int, prefix: str = ""):
        for k, v in scalars.items():
            try:
                self.add_scalar(f"{prefix}{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def rd_probe(model, images, lmbda: float, max_images: int = 8):
    """Entropy-estimation RD on held-out full images (reference
    test_kodak, train_ckbd_gmm.py:66-114): per-image padded forward,
    bpp from likelihoods, PSNR on [0,1].

    ``images``: iterable of [H, W, 3] float arrays. Returns dict of means.
    """
    import jax.numpy as jnp

    from flashgmm_tpu.ops import compute_padding

    bpps, psnrs, losses = [], [], []
    for i, img in enumerate(images):
        if i >= max_images:
            break
        x = jnp.asarray(img)[None]
        h, w = x.shape[1:3]
        left, right, top, bottom = compute_padding(h, w, min_div=64)[0]
        x_pad = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)))
        out = model(x_pad, training=False)
        num_pixels = h * w
        bpp = sum(
            float(jnp.sum(-jnp.log2(lk))) for lk in
            _tree_leaves(out["likelihoods"])
        ) / num_pixels
        x_hat = out["x_hat"][:, top: top + h, left: left + w]
        mse = float(jnp.mean((x_hat - x) ** 2))
        psnr = -10.0 * float(jnp.log10(jnp.maximum(mse, 1e-12)))
        bpps.append(bpp)
        psnrs.append(psnr)
        losses.append(lmbda * 255.0**2 * mse + bpp)
    n = max(len(bpps), 1)
    return {
        "probe_bpp": sum(bpps) / n,
        "probe_psnr": sum(psnrs) / n,
        "probe_rd_loss": sum(losses) / n,
        "probe_images": len(bpps),
    }


def _tree_leaves(t):
    import jax

    return jax.tree.leaves(t)
