"""Single "net" optimizer over all parameters (no aux split).

Equivalent of compressai/optimizers/net.py: for models without an
EntropyBottleneck quantiles parameter (or when the aux loss is folded in).
"""

import optax

from flashgmm_tpu.registry import register_optimizer


@register_optimizer("net_optimizer")
def net_optimizer(model, conf: dict):
    """Build {"net": optax tx} from ``{"net": {"type": "Adam", "lr": ...}}``."""
    opt_conf = conf["net"]
    if opt_conf.get("type", "Adam") != "Adam":
        raise ValueError(f"Unsupported optimizer {opt_conf['type']}")
    return {"net": optax.adam(opt_conf.get("lr", 1e-4))}
