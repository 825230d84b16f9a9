"""Native .npz weight files (the repo's own training checkpoints).

One loader shared by bench.py and the tools/ scripts (previously four
inline copies). Keys are "/"-joined nnx state paths; values are stored
fp16 (size) and loaded as fp32.
"""

import os

import numpy as np


def load_npz_weights(model, path: str) -> int:
    """Load matching Param tensors from ``path`` into ``model`` (in place).

    Returns the number of tensors loaded (0 if the file is absent).
    """
    if not os.path.exists(path):
        return 0
    import jax.numpy as jnp
    from flax import nnx

    data = np.load(path)
    state = nnx.state(model, nnx.Param)
    flat = nnx.to_flat_state(state)
    n_loaded = 0
    for p, v in flat:
        keyname = "/".join(str(x) for x in p)
        if keyname in data:
            v.value = jnp.asarray(data[keyname].astype(np.float32))
            n_loaded += 1
    nnx.update(model, nnx.from_flat_state(flat))
    return n_loaded


def save_npz_weights(model, path: str) -> None:
    """Save all Param tensors of ``model`` to ``path`` (fp16-compressed)."""
    import jax
    from flax import nnx

    state = nnx.state(model, nnx.Param)
    arrays = {}
    for p, v in nnx.to_flat_state(state):
        keyname = "/".join(str(x) for x in p)
        arrays[keyname] = np.asarray(jax.device_get(v.value)).astype(np.float16)
    np.savez_compressed(path, **arrays)
