"""Checkpoint save/load via orbax (reference: torch state_dict checkpoints,
train_ckbd_gmm.py:364-369, 583-597; post-training CDF materialization is
``model.update()`` + the update_model CLI)."""

import json
import os
from pathlib import Path

import jax
from flax import nnx


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def _strip_empty(tree):
    """Orbax refuses zero-size arrays (uninitialized CDF buffers) — drop
    them; update()/converter re-materializes after restore."""
    return jax.tree.map(
        lambda v: None if hasattr(v, "size") and v.size == 0 else v, tree
    )


def _merge_restored(template, restored):
    def pick(t, r):
        return t if r is None else r

    return jax.tree.map(pick, template, restored, is_leaf=lambda v: v is None)


def save_checkpoint(path, model, opt_net=None, opt_aux=None, meta=None):
    path = Path(path).absolute()
    tree = {"model": nnx.to_pure_dict(nnx.state(model))}
    if opt_net is not None:
        tree["opt_net"] = nnx.to_pure_dict(nnx.state(opt_net))
    if opt_aux is not None:
        tree["opt_aux"] = nnx.to_pure_dict(nnx.state(opt_aux))
    tree = _strip_empty(tree)
    ckptr = _ckptr()
    import shutil

    if path.exists():
        shutil.rmtree(path)
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(str(path) + ".meta.json", "w") as f:
            json.dump(meta, f)


def _adopt_saved_shapes(path, ckptr, tree):
    """Template for restore: the model's own state, except zero-size
    buffers (unmaterialized CDF tables in a freshly-built model) take
    their shape/dtype from the checkpoint — so tables materialized by
    ``model.update()`` + the update_model CLI survive a fresh-process
    load instead of being silently dropped (the reference ships its zoo
    checkpoints with tables materialized the same way)."""
    try:
        saved = ckptr.metadata(path).item_metadata.tree
    except Exception:
        return _strip_empty(tree)

    def pick(keypath, t):
        if not (hasattr(t, "size") and t.size == 0):
            return t
        node = saved
        try:
            for k in keypath:
                node = node[getattr(k, "key", k)]
        except (KeyError, TypeError):
            return None  # not in checkpoint either: drop as before
        if node is None or not hasattr(node, "shape"):
            return None
        import numpy as np

        return jax.ShapeDtypeStruct(tuple(node.shape), np.dtype(node.dtype))

    return jax.tree_util.tree_map_with_path(pick, tree)


def load_checkpoint(path, model, opt_net=None, opt_aux=None):
    """Restore in place; returns the meta dict (possibly empty)."""
    path = Path(path).absolute()
    ckptr = _ckptr()

    tree = {"model": nnx.to_pure_dict(nnx.state(model))}
    if opt_net is not None:
        tree["opt_net"] = nnx.to_pure_dict(nnx.state(opt_net))
    if opt_aux is not None:
        tree["opt_aux"] = nnx.to_pure_dict(nnx.state(opt_aux))
    restored = ckptr.restore(path, _adopt_saved_shapes(path, ckptr, tree))
    restored = _merge_restored(tree, restored)

    state = nnx.state(model)
    nnx.replace_by_pure_dict(state, restored["model"])
    nnx.update(model, state)
    if opt_net is not None and "opt_net" in restored:
        s = nnx.state(opt_net)
        nnx.replace_by_pure_dict(s, restored["opt_net"])
        nnx.update(opt_net, s)
    if opt_aux is not None and "opt_aux" in restored:
        s = nnx.state(opt_aux)
        nnx.replace_by_pure_dict(s, restored["opt_aux"])
        nnx.update(opt_aux, s)

    meta_path = str(path) + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}
