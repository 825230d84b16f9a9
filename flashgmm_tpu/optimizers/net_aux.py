"""Net/aux parameter split (compressai/optimizers/net_aux.py:39-80).

The "net" optimizer trains everything except the EntropyBottleneck
``quantiles``; the "aux" optimizer trains only the quantiles (whose loss is
data-independent). Implemented as optax masks over the nnx param state.
"""

import optax
from flax import nnx


def _is_quantiles_path(path) -> bool:
    return any(str(p) == "quantiles" for p in path)


def net_aux_partition(params_state):
    """Returns (net_mask, aux_mask) pytrees over a ``nnx.State`` of Params."""
    flat = nnx.to_flat_state(params_state)
    net = {}
    aux = {}
    for path, value in flat:
        if _is_quantiles_path(path):
            aux[path] = True
            net[path] = False
        else:
            aux[path] = False
            net[path] = True
    net_state = nnx.from_flat_state([(p, v) for (p, _), v in zip(flat, net.values())])
    aux_state = nnx.from_flat_state([(p, v) for (p, _), v in zip(flat, aux.values())])
    return net_state, aux_state


def net_aux_optimizer(model, conf: dict):
    """Build {"net": optax tx, "aux": optax tx} pair with masks applied.

    conf example::

        {"net": {"type": "Adam", "lr": 1e-4}, "aux": {"type": "Adam", "lr": 1e-3}}
    """

    def make(opt_conf):
        if opt_conf.get("type", "Adam") != "Adam":
            raise ValueError(f"Unsupported optimizer {opt_conf['type']}")
        return optax.adam(opt_conf.get("lr", 1e-4))

    params = nnx.state(model, nnx.Param)

    def net_mask(_):
        return nnx.map_state(
            lambda path, v: not _is_quantiles_path(path), params
        )

    def aux_mask(_):
        return nnx.map_state(lambda path, v: _is_quantiles_path(path), params)

    return {
        "net": optax.masked(make(conf["net"]), net_mask),
        "aux": optax.masked(make(conf["aux"]), aux_mask),
    }
