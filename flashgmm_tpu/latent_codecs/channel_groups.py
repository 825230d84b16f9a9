"""Channel-conditional groups codec (Minnen2020 / ELIC SCCTX)
(compressai/latent_codecs/channel_groups.py:48-172).

Groups are decoded sequentially (static Python loop — group count is
small and fixed); each group's context conv runs as one dense NHWC conv
over all previously decoded groups.
"""

from itertools import accumulate
from typing import List, Mapping, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.registry import register_module

from .base import LatentCodec


@register_module("ChannelGroupsLatentCodec")
class ChannelGroupsLatentCodec(LatentCodec):
    def __init__(
        self,
        latent_codec: Optional[Mapping[str, LatentCodec]] = None,
        channel_context: Optional[Mapping[str, object]] = None,
        *,
        groups: List[int],
        context_mode: str = "all",
        **kwargs,
    ):
        # context_mode: "all" concatenates every previously decoded group;
        # "first_and_last" uses only the first + most recent (the Chandelier
        # ELIC variant, sensetime.py:523-538).
        assert context_mode in ("all", "first_and_last")
        self.groups = list(groups)
        self.groups_acc = list(accumulate(self.groups, initial=0))
        self.context_mode = context_mode
        self.channel_context = nnx.Dict(channel_context or {})
        self.latent_codec = nnx.Dict(latent_codec or {})

    def _merge_y(self, y_hat_list):
        if self.context_mode == "first_and_last" and 1 < len(y_hat_list) < len(self.groups):
            return jnp.concatenate([y_hat_list[0], y_hat_list[-1]], axis=-1)
        return jnp.concatenate(y_hat_list, axis=-1)

    def _split(self, y):
        return [
            y[..., self.groups_acc[k] : self.groups_acc[k + 1]]
            for k in range(len(self.groups))
        ]

    def _get_ctx_params(self, k, side_params, y_hat_):
        if k == 0:
            return side_params
        ch_ctx = self.channel_context[f"y{k}"](self._merge_y(y_hat_[:k]))
        return jnp.concatenate([ch_ctx, side_params], axis=-1)

    def __call__(self, y, side_params, training: bool = True, key=None):
        y_ = self._split(y)
        keys = (
            jax.random.split(key, len(self.groups))
            if key is not None
            else [None] * len(self.groups)
        )
        y_hat_ = []
        y_lk_ = []
        for k in range(len(self.groups)):
            params = self._get_ctx_params(k, side_params, y_hat_)
            y_out = self.latent_codec[f"y{k}"](
                y_[k], params, training=training, key=keys[k]
            )
            y_hat_.append(y_out["y_hat"])
            y_lk_.append(y_out["likelihoods"]["y"])
        return {
            "likelihoods": {"y": jnp.concatenate(y_lk_, axis=-1)},
            "y_hat": jnp.concatenate(y_hat_, axis=-1),
        }

    def compress(self, y, side_params):
        y_ = self._split(y)
        y_hat_ = []
        strings = []
        shapes = []
        for k in range(len(self.groups)):
            params = self._get_ctx_params(k, side_params, y_hat_)
            y_out = self.latent_codec[f"y{k}"].compress(y_[k], params)
            y_hat_.append(y_out["y_hat"])
            strings.extend(y_out["strings"])
            shapes.append(y_out["shape"])
        return {
            "strings": strings,
            "shape": shapes,
            "y_hat": jnp.concatenate(y_hat_, axis=-1),
        }

    def decompress(self, strings, shape, side_params, **kwargs):
        strings_per_group = len(strings) // len(self.groups)
        y_hat_ = []
        for k in range(len(self.groups)):
            params = self._get_ctx_params(k, side_params, y_hat_)
            y_out = self.latent_codec[f"y{k}"].decompress(
                strings[strings_per_group * k : strings_per_group * (k + 1)],
                shape[k],
                params,
            )
            y_hat_.append(y_out["y_hat"])
        return {"y_hat": jnp.concatenate(y_hat_, axis=-1)}
