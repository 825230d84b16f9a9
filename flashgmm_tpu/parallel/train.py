"""Data-parallel training step (SPMD over a jax Mesh).

Replaces the reference's vestigial nn.DataParallel (train_ckbd_gmm.py:189-196)
with native sharded training: params replicated, batch sharded over the
``data`` axis, XLA inserts the gradient all-reduce over ICI from the
shardings. The net/aux optimizer split follows the reference
(optimizers/net_aux.py:39-80) via nnx variable-type filters.
"""

import jax
import optax
from flax import nnx
from flashgmm_tpu.entropy_models.entropy_models import QuantilesParam
from flashgmm_tpu.losses import rate_distortion_loss

# "net" = every Param except the EB quantiles; "aux" = quantiles only.
NET_FILTER = nnx.All(nnx.Param, nnx.Not(QuantilesParam))
AUX_FILTER = QuantilesParam


def make_train_state(model, learning_rate=1e-4, aux_learning_rate=1e-3,
                     clip_max_norm=1.0):
    """Returns (net_optimizer, aux_optimizer) nnx.Optimizers."""
    net_tx = optax.chain(
        optax.clip_by_global_norm(clip_max_norm) if clip_max_norm else optax.identity(),
        optax.adam(learning_rate),
    )
    aux_tx = optax.adam(aux_learning_rate)
    opt_net = nnx.Optimizer(model, net_tx, wrt=NET_FILTER)
    opt_aux = nnx.Optimizer(model, aux_tx, wrt=AUX_FILTER)
    return opt_net, opt_aux


@nnx.jit(static_argnames=("lmbda",))
def data_parallel_train_step(model, opt_net, opt_aux, batch, key, lmbda: float = 1e-2):
    """One RD step + one aux step; works on any mesh when ``batch`` is
    sharded over the data axis (single-device otherwise)."""

    def loss_fn(m):
        out = m(batch, training=True, key=key)
        d = rate_distortion_loss(out, batch, lmbda=lmbda)
        return d["loss"], d

    grad_fn = nnx.value_and_grad(
        loss_fn, argnums=nnx.DiffState(0, NET_FILTER), has_aux=True
    )
    (loss, details), grads = grad_fn(model)
    opt_net.update(model, grads)

    def aux_loss_fn(m):
        return m.aux_loss()

    aux_grad_fn = nnx.value_and_grad(aux_loss_fn, argnums=nnx.DiffState(0, AUX_FILTER))
    aux_loss, aux_grads = aux_grad_fn(model)
    opt_aux.update(model, aux_grads)

    return {
        "loss": loss,
        "bpp_loss": details["bpp_loss"],
        "mse_loss": details["mse_loss"],
        "aux_loss": aux_loss,
    }
