"""Variable-bitrate entropy models (compressai/entropy_models/
entropy_models_vbr.py:51-648).

Adds a quantization-step ``qs`` to quantize/dequantize/update so one model
serves multiple rates (Kamisli et al., DCC 2024).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .entropy_models import EntropyBottleneck, GaussianConditional, _sigmoid


class EntropyBottleneckVbr(EntropyBottleneck):
    """EntropyBottleneck with variable quantization step size."""

    def quantize_variable(self, inputs, mode, means=None, qs=None, key=None):
        if qs is None:
            return self.quantize(inputs, mode, means, key=key)
        if mode == "noise":
            assert key is not None
            noise = jax.random.uniform(key, inputs.shape, inputs.dtype, -0.5, 0.5)
            return inputs + noise * qs
        outputs = inputs
        if means is not None:
            outputs = outputs - means
        if mode == "ste":
            return outputs + jax.lax.stop_gradient(
                jnp.round(outputs / qs) * qs - outputs
            ) + (means if means is not None else 0.0)
        if mode == "dequantize":
            outputs = jnp.round(outputs / qs) * qs
            if means is not None:
                outputs = outputs + means
            return outputs
        assert mode == "symbols"
        return jnp.round(outputs / qs).astype(jnp.int32)

    def dequantize_variable(self, inputs, means=None, qs=None):
        if qs is None:
            return self.dequantize(inputs, means)
        outputs = inputs.astype(jnp.float32) * qs
        if means is not None:
            outputs = outputs + means
        return outputs

    def _likelihood_variable(self, values, qs):
        half = qs / 2.0
        lower = self._logits_cumulative(values - half, stop_gradient=False)
        upper = self._logits_cumulative(values + half, stop_gradient=False)
        return jax.nn.sigmoid(upper) - jax.nn.sigmoid(lower)

    def __call__(self, x, training: bool = True, key=None, qs=None, ste=False):
        if qs is None:
            return super().__call__(x, training=training, key=key)
        c = x.shape[-1]
        values = jnp.moveaxis(x, -1, 0).reshape(c, 1, -1)
        medians = self._get_medians()
        mode = "ste" if ste else ("noise" if training else "dequantize")
        outputs = self.quantize_variable(values, mode, medians, qs=qs, key=key)
        likelihood = self._likelihood_variable(outputs, qs)
        likelihood = self._likelihood_lower_bound(likelihood)
        shape = (c,) + tuple(x.shape[:-1])
        outputs = jnp.moveaxis(outputs.reshape(shape), 0, -1)
        likelihood = jnp.moveaxis(likelihood.reshape(shape), 0, -1)
        return outputs, likelihood

    def update_variable(self, force: bool = False, qs=1.0) -> bool:
        """Build tables for step size ``qs`` (entropy_models_vbr.py:460+)."""
        if self._offset.value.size > 0 and not force:
            return False
        qs = float(np.asarray(jax.device_get(qs)).reshape(()))

        quantiles = np.asarray(jax.device_get(self.quantiles.value))
        medians = quantiles[:, 0, 1]
        minima = np.clip(
            np.ceil((medians - quantiles[:, 0, 0]) / qs).astype(np.int32), 0, None
        )
        maxima = np.clip(
            np.ceil((quantiles[:, 0, 2] - medians) / qs).astype(np.int32), 0, None
        )

        pmf_start = medians - minima * qs
        pmf_length = maxima + minima + 1
        max_length = int(pmf_length.max())

        samples = np.arange(max_length, dtype=np.float32) * qs
        samples = samples[None, :] + pmf_start[:, None, None]

        half = qs / 2.0
        lower = self._logits_cumulative(jnp.asarray(samples - half), True)
        upper = self._logits_cumulative(jnp.asarray(samples + half), True)
        lower = np.asarray(jax.device_get(lower))
        upper = np.asarray(jax.device_get(upper))
        pmf = (_sigmoid(upper) - _sigmoid(lower))[:, 0, :]
        tail_mass = _sigmoid(lower[:, 0, :1]) + _sigmoid(-upper[:, 0, -1:])

        quantized_cdf = self._pmf_to_cdf(pmf, tail_mass, pmf_length, max_length)
        self._quantized_cdf.value = jnp.asarray(quantized_cdf)
        self._offset.value = jnp.asarray(-minima, dtype=jnp.int32)
        self._cdf_length.value = jnp.asarray(pmf_length + 2, dtype=jnp.int32)
        return True

    def compress(self, x, qs=None):
        if qs is None:
            return super().compress(x)
        indexes = self._build_indexes(x.shape)
        medians = jax.lax.stop_gradient(self._get_medians())[:, 0, 0]
        medians_b = jnp.broadcast_to(medians[None, None, None, :], x.shape)
        symbols = self.quantize_variable(x, "symbols", medians_b, qs=qs)
        # reuse the generic table path by pre-quantized symbols
        return super(EntropyBottleneck, self).compress(
            symbols.astype(jnp.float32), indexes, None
        )

    def decompress(self, strings, size, qs=None):
        if qs is None:
            return super().decompress(strings, size)
        c = self._quantized_cdf.value.shape[0]
        output_shape = (len(strings), *size, c)
        indexes = self._build_indexes(output_shape)
        medians = jax.lax.stop_gradient(self._get_medians())[:, 0, 0]
        medians_b = jnp.broadcast_to(medians[None, None, None, :], output_shape)
        values = super(EntropyBottleneck, self).decompress(
            strings, indexes, jnp.float32, None
        )
        return self.dequantize_variable(values, means=medians_b, qs=qs)


class GaussianConditionalVbr(GaussianConditional):
    """GaussianConditional with a quantization-step parameter; rate control
    happens by scaling inputs and scales by the gain (models/vbr.py)."""

    def quantize_variable(self, inputs, mode, means=None, qs=None, key=None):
        if qs is None:
            return self.quantize(inputs, mode, means, key=key)
        if mode == "noise":
            assert key is not None
            noise = jax.random.uniform(key, inputs.shape, inputs.dtype, -0.5, 0.5)
            return inputs + noise * qs
        outputs = inputs
        if means is not None:
            outputs = outputs - means
        if mode == "dequantize":
            outputs = jnp.round(outputs / qs) * qs
            if means is not None:
                outputs = outputs + means
            return outputs
        assert mode == "symbols"
        return jnp.round(outputs / qs).astype(jnp.int32)

    def dequantize_variable(self, inputs, means=None, qs=None):
        if qs is None:
            return self.dequantize(inputs, means)
        outputs = inputs.astype(jnp.float32) * qs
        if means is not None:
            outputs = outputs + means
        return outputs
