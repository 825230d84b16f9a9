"""Spatially-tiled synthesis for high-resolution decoding.

At 2K+ the g_s activation pyramid dominates decode memory (the last
upsample stage holds HxWx192 bf16 per image at full resolution) and its
conv working set overflows VMEM, forcing XLA into HBM-spill schedules.
Tiling the latent along H trades that for a static sequence of small
programs whose stages fit on-chip — the single-chip analog of the
spatial sharding in parallel/inference.py (SURVEY.md §2.3), and
composable with it (each mesh shard can itself tile).

Exactness: every output pixel of a tile sees the full receptive field of
g_s as long as the halo covers it. For the flagship g_s (RB, 3x(RBU+RB),
subpel: 3x3 convs at 1x/2x/4x/8x latent resolution) the receptive field
is < 7 latent rows per side; HALO=8 is safe. Interior results can still
differ from the untiled program at ULP level (different fusion), which
is fine for final pixels (never for entropy-coding math — do not use
this on the rows path).
"""

import jax
import jax.numpy as jnp

HALO = 8


def g_s_tiled(transform, y_hat, tile_h: int = 32, halo: int = HALO,
              upsample: int = 16):
    """Apply a synthesis transform over H-tiles of the latent.

    Args:
        transform: callable [B, h, w, C] -> [B, h*upsample, w*upsample, 3]
            (already wrapped for bf16 etc.).
        y_hat: [B, H, W, C] latent.
        tile_h: core tile height in latent rows (static python int).
        halo: overlap rows on each side (>= g_s receptive field).
        upsample: spatial scale factor of the transform (16 for the
            flagship, models/ckbd_gmm.py g_s).

    Returns [B, H*upsample, W*upsample, 3], equal to ``transform(y_hat)``
    up to conv ULP noise.
    """
    b, h, w, c = y_hat.shape
    if h <= tile_h + 2 * halo:
        return transform(y_hat)
    n_tiles = -(-h // tile_h)
    outs = []
    for t in range(n_tiles):  # static count: unrolled, each tile one program
        y0 = t * tile_h
        y1 = min(h, y0 + tile_h)
        top = max(0, y0 - halo)
        bot = min(h, y1 + halo)
        xt = transform(y_hat[:, top:bot])
        outs.append(xt[:, (y0 - top) * upsample:(y1 - top) * upsample])
    return jnp.concatenate(outs, axis=1)


def make_tiled_gs(codec, tile_h: int = 32, halo: int = HALO,
                  upsample: int = 16):
    """A jitted tiled-g_s using a fast codec's transform settings.

    One compile per distinct tile shape (at most two: interior + last);
    reuses the codec's bf16 policy. Usage:

        gs = make_tiled_gs(codec)
        x_hat = gs(codec.decode_y_hat(streams, y_shape))
    """
    graphdef = codec._graphdef
    state = codec._state
    bf16 = codec.bf16_transforms

    from flashgmm_tpu.runtime.fast_codec import apply_transform
    from flax import nnx

    @jax.jit
    def one_tile(state, yt):
        m = nnx.merge(graphdef, state)
        return jnp.clip(apply_transform(m.g_s, yt, bf16), 0.0, 1.0)

    def run(y_hat):
        return g_s_tiled(lambda yt: one_tile(state, yt), y_hat,
                         tile_h=tile_h, halo=halo, upsample=upsample)

    return run
