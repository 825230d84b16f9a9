"""flashgmm_tpu model -> PyTorch (CompressAI/FlashGMM) state-dict export.

Inverse of :mod:`flashgmm_tpu.zoo.torch_convert`: walks the nnx module graph
and emits a ``{torch_key: np.ndarray}`` dict in the reference's layouts
(conv kernels HWIO->OIHW, transposed convs HWIO->IOHW) so the reference
PyTorch network (e.g. /root/reference/compressai/models/ckbd_gmm.py:61-141)
can be run with weights trained in this framework.  Used by the model-level
interop goldens (tools/record_model_interop_goldens.py) and the
apples-to-apples reference benchmark (tools/bench_reference.py).

The export includes the entropy-model CDF buffers (_offset/_quantized_cdf/
_cdf_length) when materialized, matching the reference's post-``update()``
checkpoint convention (utils/update_model/__main__.py).
"""

import numpy as np

from flashgmm_tpu.entropy_models import (
    EntropyBottleneck,
    GaussianConditional,
)
from flashgmm_tpu.layers import GDN
from flashgmm_tpu.layers.layers import Conv2d, ConvTranspose2d

from .torch_convert import _torch_path


def _np(v):
    return np.asarray(v)


def export_torch_state_dict(model):
    """Returns ``{torch_key: np.ndarray}`` for ``model``'s parameters."""
    from flax import nnx

    sd = {}
    nodes = {
        tuple(str(q) for q in p): n for p, n in nnx.iter_graph(model)
    }
    for path, node in nnx.iter_graph(model):
        prefix = _torch_path(path, nodes).lstrip(".")

        def put(suffix, arr):
            key = f"{prefix}.{suffix}" if prefix else suffix
            sd[key] = arr

        if isinstance(node, ConvTranspose2d):
            # ours: [kH, kW, I, O] -> torch ConvTranspose2d [I, O, kH, kW]
            put("weight", np.transpose(_np(node.kernel.value), (2, 3, 0, 1)))
            if node.bias is not None:
                put("bias", _np(node.bias.value))
        elif isinstance(node, Conv2d):  # covers MaskedConv2d subclasses
            # ours: [kH, kW, I, O] -> torch Conv2d [O, I, kH, kW]
            put("weight", np.transpose(_np(node.kernel.value), (3, 2, 0, 1)))
            if node.bias is not None:
                put("bias", _np(node.bias.value))
        elif isinstance(node, GDN):
            put("beta", _np(node.beta.value))
            put("gamma", _np(node.gamma.value))
        elif isinstance(node, EntropyBottleneck):
            for i in range(node._num_layers):
                put(f"_matrix{i}", _np(getattr(node, f"matrix{i}").value))
                put(f"_bias{i}", _np(getattr(node, f"bias{i}").value))
                if i < len(node.filters):
                    put(f"_factor{i}", _np(getattr(node, f"factor{i}").value))
            put("quantiles", _np(node.quantiles.value))
            _put_em_buffers(node, put)
        elif isinstance(node, GaussianConditional):
            st = _np(node.scale_table.value) if node.scale_table is not None \
                else np.zeros((0,), np.float32)
            put("scale_table", st)
            _put_em_buffers(node, put)
    return sd


def _put_em_buffers(node, put):
    for name, attr in (
        ("_offset", node._offset),
        ("_quantized_cdf", node._quantized_cdf),
        ("_cdf_length", node._cdf_length),
    ):
        # always emitted (possibly size-0): the reference's load_state_dict
        # resizes registered buffers from these keys and KeyErrors if any is
        # missing for a module with other keys present (models/utils.py:74)
        put(name, _np(attr.value).astype(np.int32))


def load_into_torch_model(torch_model, state_dict, strict_params: bool = True):
    """Load an exported dict into a reference PyTorch module.

    Buffers absent from the export (masks, LowerBound bounds, EB ``target``)
    keep the torch module's constructor values, which are definitionally
    identical.  With ``strict_params`` every torch *parameter* must be
    covered by the export or a KeyError is raised.
    """
    import torch

    tsd = torch_model.state_dict()
    param_names = {n for n, _ in torch_model.named_parameters()}
    missing = [n for n in param_names if n not in state_dict]
    if strict_params and missing:
        raise KeyError(f"export does not cover torch params: {missing[:8]}")
    new = {}
    for k, v in state_dict.items():
        if k not in tsd:
            continue
        t = torch.from_numpy(np.ascontiguousarray(v))
        new[k] = t.to(tsd[k].dtype) if tsd[k].dtype.is_floating_point else t
    # CompressionModel.load_state_dict resizes registered CDF buffers
    torch_model.load_state_dict(new, strict=False)
    return [k for k in state_dict if k not in tsd]
