"""Bound operators with straight-through-style gradients.

Functional JAX equivalent of the reference's autograd LowerBound
(/root/reference/compressai/ops/bound_ops.py:36-80): forward is
``max(x, bound)``; the gradient passes through whenever ``x >= bound``
or when the gradient pushes ``x`` up towards the bound (``grad < 0``
under torch's convention, i.e. cotangent that would increase x).
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    """``max(x, bound)`` with identity gradient when the gradient moves
    ``x`` towards/above the bound."""
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    gx = jnp.where(pass_through, g, jnp.zeros_like(g))
    # bound is treated as a non-differentiable constant (reference returns
    # None for its grad).
    return gx, jnp.zeros_like(bound)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)
