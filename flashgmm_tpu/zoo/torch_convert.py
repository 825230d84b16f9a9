"""PyTorch (CompressAI/FlashGMM) checkpoint -> flashgmm_tpu state converter.

Walks the nnx module graph and pulls each leaf from the torch state dict,
transposing conv kernels OIHW->HWIO (transposed convs IOHW->HWIO with the
in/out axes kept in torch order; our ConvTranspose2d flips spatially at call
time, matching torch semantics — see tests/test_torch_parity.py).

Reproduces the reference's legacy key renames (zoo/pretrained.py:39-62,
eval_ckbd.py:100-110) and resizes the entropy-model CDF buffers to the
checkpoint shapes (models/utils.py:66-131).
"""

import re

import jax.numpy as jnp
import numpy as np
from flax import nnx

from flashgmm_tpu.entropy_models import (
    EntropyBottleneck,
    GaussianConditional,
)
from flashgmm_tpu.layers import GDN
from flashgmm_tpu.layers.layers import Conv2d, ConvTranspose2d, MaskedConv2d


def rename_legacy_keys(state_dict):
    """Legacy CompressAI checkpoint key renames (zoo/pretrained.py:39-62)."""
    out = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")  # DataParallel prefix
        for i in range(4):
            k = re.sub(rf"_biases\.{i}$", f"_bias{i}", k)
            k = re.sub(rf"_matrices\.{i}$", f"_matrix{i}", k)
            k = re.sub(rf"_factors\.{i}$", f"_factor{i}", k)
        out[k] = v
    return out


def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _torch_path(path, nodes=None):
    """nnx graph path -> torch module path.

    Drops our Sequential 'layers' level, and the 'latent_codec' dict level
    inside codecs the reference registers with ``save_direct=True``
    (latent_codecs/base.py:50-76: Hyperprior, Checkerboard,
    GainHyperprior) — e.g. our ``latent_codec.latent_codec.y`` is torch's
    ``latent_codec.y``.  ChannelGroups uses an ``nn.ModuleDict``
    (channel_groups.py:84), so ITS level is kept.  ``nodes`` maps visited
    path prefixes to module objects (parents are visited first) so the
    containing codec's type decides; without it every non-leading level is
    dropped (pre-ELIC behavior).
    """
    parts = []
    for i, p in enumerate(path):
        s = str(p)
        if s == "layers":
            continue
        if s == "latent_codec" and i > 0:
            keep = False
            if nodes is not None:
                from flashgmm_tpu.latent_codecs import ChannelGroupsLatentCodec

                parent = nodes.get(tuple(str(q) for q in path[:i]))
                keep = isinstance(parent, ChannelGroupsLatentCodec)
            if not keep:
                continue
        parts.append(s)
    return ".".join(parts)


def load_torch_state_dict(model, state_dict, strict: bool = True):
    """Load a torch state dict (tensors or numpy arrays) into ``model``.

    Returns the list of unused torch keys.
    """
    sd = rename_legacy_keys(dict(state_dict))
    used = set()

    def take(key):
        key = key.lstrip(".")
        if key not in sd:
            if strict:
                raise KeyError(f"Missing torch key: {key}")
            return None
        used.add(key)
        return _to_np(sd[key])

    # two passes: iter_graph visits children before parents, and
    # _torch_path needs the PARENT node type to resolve dict levels
    nodes = {
        tuple(str(q) for q in p): n for p, n in nnx.iter_graph(model)
    }
    for path, node in nnx.iter_graph(model):
        prefix = _torch_path(path, nodes)
        if isinstance(node, ConvTranspose2d):
            w = take(f"{prefix}.weight")
            if w is not None:
                node.kernel.value = jnp.asarray(np.transpose(w, (2, 3, 0, 1)))
            if node.bias is not None:
                b = take(f"{prefix}.bias")
                if b is not None:
                    node.bias.value = jnp.asarray(b)
        elif isinstance(node, Conv2d):  # covers MaskedConv2d subclasses
            w = take(f"{prefix}.weight")
            if w is not None:
                node.kernel.value = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            if node.bias is not None:
                b = take(f"{prefix}.bias")
                if b is not None:
                    node.bias.value = jnp.asarray(b)
            if isinstance(node, MaskedConv2d):
                used.add(f"{prefix}.mask".lstrip("."))  # buffer; ours is static
        elif isinstance(node, GDN):
            beta = take(f"{prefix}.beta")
            gamma = take(f"{prefix}.gamma")
            if beta is not None:
                node.beta.value = jnp.asarray(beta)
            if gamma is not None:
                node.gamma.value = jnp.asarray(gamma)
        elif isinstance(node, EntropyBottleneck):
            for i in range(node._num_layers):
                m = take(f"{prefix}._matrix{i}")
                b = take(f"{prefix}._bias{i}")
                if m is not None:
                    getattr(node, f"matrix{i}").value = jnp.asarray(m)
                if b is not None:
                    getattr(node, f"bias{i}").value = jnp.asarray(b)
                if i < len(node.filters):
                    f = take(f"{prefix}._factor{i}")
                    if f is not None:
                        getattr(node, f"factor{i}").value = jnp.asarray(f)
            q = take(f"{prefix}.quantiles")
            if q is not None:
                node.quantiles.value = jnp.asarray(q)
            _load_em_buffers(node, prefix, take)
            used.add(f"{prefix}.target".lstrip("."))
        elif isinstance(node, GaussianConditional):
            st = take(f"{prefix}.scale_table") if f"{prefix}.scale_table" in sd \
                else None
            if st is not None:
                node.scale_table.value = jnp.asarray(st)
            used.add(f"{prefix}.scale_bound".lstrip("."))
            _load_em_buffers(node, prefix, take, required=False)

    unused = [k for k in sd if k not in used]
    return unused


def _load_em_buffers(node, prefix, take, required: bool = False):
    """Resize + load _offset/_quantized_cdf/_cdf_length (shapes vary per
    checkpoint; cf. update_registered_buffers, models/utils.py:66-131)."""
    for name, attr in (
        ("_offset", node._offset),
        ("_quantized_cdf", node._quantized_cdf),
        ("_cdf_length", node._cdf_length),
    ):
        key = f"{prefix}.{name}"
        try:
            v = take(key)
        except KeyError:
            if required:
                raise
            continue
        if v is not None and v.size:
            attr.value = jnp.asarray(v.astype(np.int32))


def load_checkpoint_file(model, path, strict: bool = True):
    """Load a .pth/.pt checkpoint file (uses torch for unpickling)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return load_torch_state_dict(model, ckpt, strict=strict)
