"""Basic structural layers (compressai/layers/basic.py:47-112)."""

from typing import Callable, Sequence

import jax.numpy as jnp
from flax import nnx


class Lambda(nnx.Module):
    def __init__(self, fn: Callable):
        self.fn = nnx.data(fn) if hasattr(nnx, "data") else fn

    def __call__(self, x):
        fn = self.fn
        return fn(x)


class NamedLayer(nnx.Module):
    """No-op layer carrying a name (useful for checkpoint key mapping)."""

    def __init__(self, name: str):
        self.name = name

    def __call__(self, x):
        return x


class Reshape(nnx.Module):
    def __init__(self, shape: Sequence[int]):
        self.shape = tuple(shape)

    def __call__(self, x):
        return x.reshape(x.shape[0], *self.shape)


class Transpose(nnx.Module):
    def __init__(self, axes: Sequence[int]):
        self.axes = tuple(axes)

    def __call__(self, x):
        return jnp.transpose(x, self.axes)


class Interleave(nnx.Module):
    """Interleave channel groups: [g0c0, g1c0, g0c1, ...]."""

    def __init__(self, groups: int):
        self.groups = groups

    def __call__(self, x):
        g = self.groups
        n, h, w, c = x.shape
        return (
            x.reshape(n, h, w, g, c // g).swapaxes(3, 4).reshape(n, h, w, c)
        )
