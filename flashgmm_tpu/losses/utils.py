"""Loss helpers.

Equivalent of compressai/losses/utils.py: per-likelihood-tensor bit/bpp
breakdown used by composite (e.g. video) losses for logging.
"""

import jax.numpy as jnp


def compute_rate_loss(likelihoods, batch_size, num_pixels_per_item):
    """Per-name bit and bpp losses + totals.

    ``likelihoods``: {name: tensor}; returns
    {"bit_<name>_loss", "bpp_<name>_loss", ..., "bit_loss", "bpp_loss"}.
    """
    out_bit = {
        f"bit_{name}_loss": jnp.sum(jnp.log2(lk)) / -batch_size
        for name, lk in likelihoods.items()
    }
    out_bpp = {
        f"bpp_{name}_loss": v / num_pixels_per_item
        for name, v in zip(likelihoods.keys(), out_bit.values())
    }
    out = {**out_bit, **out_bpp}
    out["bit_loss"] = sum(out_bit.values())
    out["bpp_loss"] = out["bit_loss"] / num_pixels_per_item
    return out

