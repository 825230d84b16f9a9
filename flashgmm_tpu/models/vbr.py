"""Variable-bitrate models (compressai/models/vbr.py:25-982).

One model covering the 8-lambda quality sweep via learned per-level gains
(inverse quantization steps) and a quantization-reconstruction-offset MLP
(Kamisli/Racape/Choi, DCC 2024). ``stage=1`` trains the base (fixed-rate)
path; ``stage=2`` enables the VBR modules.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from flashgmm_tpu.entropy_models.entropy_models_vbr import (
    EntropyBottleneckVbr,
)
from flashgmm_tpu.ops import lower_bound, quantize_ste
from flashgmm_tpu.registry import register_model

from .base import get_scale_table
from .google import (
    JointAutoregressiveHierarchicalPriors,
    MeanScaleHyperprior,
    ScaleHyperprior,
)

VBR_LMBDAS = [0.0018, 0.0035, 0.0067, 0.0130, 0.025, 0.0483, 0.0932, 0.18]
VBR_GAINS = [0.10000, 0.13944, 0.19293, 0.26874, 0.37268, 0.51801, 0.71957, 1.0]


class _MLP(nnx.Module):
    def __init__(self, dims, final_softplus=False, *, rngs):
        self.linears = nnx.List(
            [nnx.Linear(i, o, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])]
        )
        self.final_softplus = final_softplus

    def __call__(self, x):
        n = len(self.linears)
        for i, lin in enumerate(self.linears):
            x = lin(x)
            if i < n - 1:
                x = jax.nn.relu(x)
        if self.final_softplus:
            x = jax.nn.softplus(x)
        return x


@register_model("bmshj2018-hyperprior-vbr")
class ScaleHyperpriorVbr(ScaleHyperprior):
    def __init__(self, N, M, vr_entbttlnck: bool = False, *, rngs=None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(N, M, rngs=rngs, **kwargs)
        self.lmbda = list(VBR_LMBDAS)
        self.levels = len(self.lmbda)
        self.Gain = nnx.Param(jnp.asarray(VBR_GAINS, jnp.float32))
        # quant offset from (stdev, gain)
        self.QuantABCD = _MLP([2, 12, 12, 1], rngs=rngs)
        self.no_quantoffset = False
        self.vr_entbttlnck = bool(vr_entbttlnck)
        if self.vr_entbttlnck:
            self.entropy_bottleneck = EntropyBottleneckVbr(N, rngs=rngs)
            self.gayn2zqstep = _MLP([1, 10, 10, 1], final_softplus=True, rngs=rngs)

    def _zqstep(self, scale):
        q = self.gayn2zqstep(jnp.reshape(1.0 / scale, (1, 1)))[0, 0]
        return lower_bound(q, 0.5)

    def _get_scale(self, s: int, inputscale=0):
        # s may be a traced int32 (vbr_train_step samples the level per
        # step inside one compiled program) — clamp with jnp, not python
        s = jnp.clip(s, 0, self.levels - 1)
        if inputscale:
            return jnp.asarray(inputscale, jnp.float32)
        return jax.lax.stop_gradient(jnp.abs(self.Gain.value[s]))

    def _quant_offsets(self, q_abs, q_stdev, scale):
        """-(QuantABCD(stdev, gain)); zero where quantized to zero."""
        inp = jnp.stack(
            [q_stdev, jnp.broadcast_to(scale, q_stdev.shape)], axis=-1
        )
        q_off = -self.QuantABCD(inp)[..., 0]
        return jnp.where(q_abs < 1e-4, 0.0, q_off)

    def __call__(self, x, training: bool = True, key=None, stage: int = 2,
                 s: int = 1, inputscale=0):
        if stage == 1:
            return super().__call__(x, training=training, key=key)

        scale = self._get_scale(s, inputscale)
        rescale = 1.0 / jax.lax.stop_gradient(scale)
        k1, k2 = jax.random.split(key) if key is not None else (None, None)

        y = self.g_a(x)
        z = self.h_a(jnp.abs(y))
        if not self.vr_entbttlnck:
            _, z_likelihoods = self.entropy_bottleneck(z, training=training, key=k1)
            z_offset = self.entropy_bottleneck._get_medians()[:, 0, 0]
            z_hat = quantize_ste(z - z_offset) + z_offset
        else:
            z_qstep = self._zqstep(scale)
            z_hat, z_likelihoods = self.entropy_bottleneck(
                z, training=training, key=k1, qs=z_qstep
            )
        scales_hat = self.h_s(z_hat)

        if self.no_quantoffset:
            y_hat = quantize_ste(y * scale) * rescale
        else:
            y_zm_sc = y * scale
            signs = jax.lax.stop_gradient(jnp.sign(y_zm_sc))
            q_abs = quantize_ste(jnp.abs(y_zm_sc))
            q_stdev = self.gaussian_conditional.lower_bound_scale(scales_hat * scale)
            q_offsets = self._quant_offsets(q_abs, q_stdev, scale)
            y_hat = signs * (q_abs + q_offsets) * rescale
        _, y_likelihoods = self.gaussian_conditional(
            y * scale, scales_hat * scale, training=training, key=k2
        )
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    def update(self, scale_table=None, force=False, scale=None):
        if scale_table is None:
            scale_table = get_scale_table()
        updated = self.gaussian_conditional.update_scale_table(
            scale_table, force=force
        )
        if isinstance(self.entropy_bottleneck, EntropyBottleneckVbr) and \
                scale is not None:
            z_qstep = self._zqstep(jnp.asarray(scale, jnp.float32))
            updated |= self.entropy_bottleneck.update_variable(
                force=force, qs=z_qstep
            )
        else:
            updated |= self.entropy_bottleneck.update(force=force)
        return updated

    def compress(self, x, stage: int = 2, s: int = 1, inputscale=0):
        if stage == 1:
            return super().compress(x)
        scale = self._get_scale(s, inputscale)
        y = self.g_a(x)
        z = self.h_a(jnp.abs(y))
        if not self.vr_entbttlnck:
            z_strings = self.entropy_bottleneck.compress(z)
            z_hat = self.entropy_bottleneck.decompress(z_strings, z.shape[1:3])
        else:
            z_qstep = self._zqstep(scale)
            z_strings = self.entropy_bottleneck.compress(z, qs=z_qstep)
            z_hat = self.entropy_bottleneck.decompress(
                z_strings, z.shape[1:3], qs=z_qstep
            )
        scales_hat = self.h_s(z_hat)
        indexes = self.gaussian_conditional.build_indexes(scales_hat * scale)
        y_strings = self.gaussian_conditional.compress(y * scale, indexes)
        return {
            "strings": [y_strings, z_strings],
            "shape": z.shape[1:3],
            "s": s,
        }

    def decompress(self, strings, shape, stage: int = 2, s: int = 1,
                   inputscale=0):
        if stage == 1:
            return super().decompress(strings, shape)
        scale = self._get_scale(s, inputscale)
        rescale = 1.0 / scale
        if not self.vr_entbttlnck:
            z_hat = self.entropy_bottleneck.decompress(strings[1], shape)
        else:
            z_qstep = self._zqstep(scale)
            z_hat = self.entropy_bottleneck.decompress(strings[1], shape, qs=z_qstep)
        scales_hat = self.h_s(z_hat)
        indexes = self.gaussian_conditional.build_indexes(scales_hat * scale)
        if self.no_quantoffset:
            y_hat = self.gaussian_conditional.decompress(strings[0], indexes) * rescale
        else:
            q_val = self.gaussian_conditional.decompress(strings[0], indexes)
            q_abs = jnp.abs(q_val)
            signs = jnp.sign(q_val)
            q_stdev = self.gaussian_conditional.lower_bound_scale(scales_hat * scale)
            q_offsets = self._quant_offsets(q_abs, q_stdev, scale)
            y_hat = signs * (q_abs + q_offsets) * rescale
        x_hat = jnp.clip(self.g_s(y_hat), 0.0, 1.0)
        return {"x_hat": x_hat}


@register_model("mbt2018-mean-vbr")
class MeanScaleHyperpriorVbr(ScaleHyperpriorVbr, MeanScaleHyperprior):
    """Mean-scale hyperprior with VBR gains; the mean is folded out before
    gain scaling (models/vbr.py:306+)."""

    def __init__(self, N, M, vr_entbttlnck: bool = False, *, rngs=None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        MeanScaleHyperprior.__init__(self, N, M, rngs=rngs, **kwargs)
        self.lmbda = list(VBR_LMBDAS)
        self.levels = len(self.lmbda)
        self.Gain = nnx.Param(jnp.asarray(VBR_GAINS, jnp.float32))
        self.QuantABCD = _MLP([2, 12, 12, 1], rngs=rngs)
        self.no_quantoffset = False
        self.vr_entbttlnck = bool(vr_entbttlnck)
        if self.vr_entbttlnck:
            self.entropy_bottleneck = EntropyBottleneckVbr(N, rngs=rngs)
            self.gayn2zqstep = _MLP([1, 10, 10, 1], final_softplus=True, rngs=rngs)

    def __call__(self, x, training: bool = True, key=None, stage: int = 2,
                 s: int = 1, inputscale=0):
        if stage == 1:
            return MeanScaleHyperprior.__call__(self, x, training=training, key=key)
        scale = self._get_scale(s, inputscale)
        rescale = 1.0 / jax.lax.stop_gradient(scale)
        k1, k2 = jax.random.split(key) if key is not None else (None, None)

        y = self.g_a(x)
        z = self.h_a(y)
        if not self.vr_entbttlnck:
            _, z_likelihoods = self.entropy_bottleneck(z, training=training, key=k1)
            z_offset = self.entropy_bottleneck._get_medians()[:, 0, 0]
            z_hat = quantize_ste(z - z_offset) + z_offset
        else:
            z_qstep = self._zqstep(scale)
            z_hat, z_likelihoods = self.entropy_bottleneck(
                z, training=training, key=k1, qs=z_qstep
            )
        gaussian_params = self.h_s(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)

        y_zm = y - means_hat
        y_zm_sc = y_zm * scale
        signs = jax.lax.stop_gradient(jnp.sign(y_zm_sc))
        q_abs = quantize_ste(jnp.abs(y_zm_sc))
        q_stdev = self.gaussian_conditional.lower_bound_scale(scales_hat * scale)
        q_offsets = self._quant_offsets(q_abs, q_stdev, scale)
        y_hat = signs * (q_abs + q_offsets) * rescale + means_hat

        _, y_likelihoods = self.gaussian_conditional(
            y * scale, scales_hat * scale, means=means_hat * scale,
            training=training, key=k2,
        )
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    def compress(self, x, stage: int = 2, s: int = 1, inputscale=0):
        if stage == 1:
            return MeanScaleHyperprior.compress(self, x)
        scale = self._get_scale(s, inputscale)
        y = self.g_a(x)
        z = self.h_a(y)
        if not self.vr_entbttlnck:
            z_strings = self.entropy_bottleneck.compress(z)
            z_hat = self.entropy_bottleneck.decompress(z_strings, z.shape[1:3])
        else:
            z_qstep = self._zqstep(scale)
            z_strings = self.entropy_bottleneck.compress(z, qs=z_qstep)
            z_hat = self.entropy_bottleneck.decompress(
                z_strings, z.shape[1:3], qs=z_qstep
            )
        gaussian_params = self.h_s(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        indexes = self.gaussian_conditional.build_indexes(scales_hat * scale)
        y_strings = self.gaussian_conditional.compress(
            y * scale, indexes, means_hat * scale
        )
        return {"strings": [y_strings, z_strings], "shape": z.shape[1:3], "s": s}

    def decompress(self, strings, shape, stage: int = 2, s: int = 1,
                   inputscale=0):
        if stage == 1:
            return MeanScaleHyperprior.decompress(self, strings, shape)
        scale = self._get_scale(s, inputscale)
        rescale = 1.0 / scale
        if not self.vr_entbttlnck:
            z_hat = self.entropy_bottleneck.decompress(strings[1], shape)
        else:
            z_qstep = self._zqstep(scale)
            z_hat = self.entropy_bottleneck.decompress(strings[1], shape, qs=z_qstep)
        gaussian_params = self.h_s(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        indexes = self.gaussian_conditional.build_indexes(scales_hat * scale)
        q_val = self.gaussian_conditional.decompress(strings[0], indexes)
        q_abs = jnp.abs(q_val)
        signs = jnp.sign(q_val)
        q_stdev = self.gaussian_conditional.lower_bound_scale(scales_hat * scale)
        q_offsets = self._quant_offsets(q_abs, q_stdev, scale)
        y_hat = signs * (q_abs + q_offsets) * rescale + means_hat
        x_hat = jnp.clip(self.g_s(y_hat), 0.0, 1.0)
        return {"x_hat": x_hat}


@register_model("mbt2018-vbr")
class JointAutoregressiveHierarchicalPriorsVbr(
    ScaleHyperpriorVbr, JointAutoregressiveHierarchicalPriors
):
    """mbt2018 with VBR gains (models/vbr.py:507-982): the AR context is
    additionally conditioned on the quantization scale via a learned
    embedding; symbols are coded in the gain-scaled domain with
    quantization-reconstruction offsets.

    stage-1 forward matches mbt2018; the stage-2 training forward uses the
    dense one-pass approximation (the reference's per-pixel STE loop is a
    training-time choice, not a bitstream requirement); compress/decompress
    run the faithful gain-scaled serial raster scan on host.
    """

    def __init__(self, N=192, M=192, *, rngs=None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        # build the mbt2018 backbone
        JointAutoregressiveHierarchicalPriors.__init__(self, N, M, rngs=rngs)
        self.lmbda = list(VBR_LMBDAS)
        self.levels = len(self.lmbda)
        self.Gain = nnx.Param(jnp.asarray(VBR_GAINS, jnp.float32))
        self.QuantABCD = _MLP([2, 12, 12, 1], rngs=rngs)
        self.no_quantoffset = False
        self.vr_entbttlnck = False
        self.scl2ctx = True
        self.scale_to_context = nnx.Linear(1, 2 * M, rngs=rngs)

    def __call__(self, x, training: bool = True, key=None, stage: int = 2,
                 s: int = 1, inputscale=0):
        from .google import JointAutoregressiveHierarchicalPriors as _Base

        if stage == 1:
            return _Base.__call__(self, x, training=training, key=key)

        scale = self._get_scale(s, inputscale)
        rescale = 1.0 / jax.lax.stop_gradient(scale)
        k1, k2 = jax.random.split(key) if key is not None else (None, None)

        y = self.g_a(x)
        z = self.h_a(y)
        _, z_likelihoods = self.entropy_bottleneck(z, training=training, key=k1)
        z_offset = self.entropy_bottleneck._get_medians()[:, 0, 0]
        z_hat = quantize_ste(z - z_offset) + z_offset
        params = self.h_s(z_hat)

        # dense approximation of the recursive STE pass: context from the
        # gain-quantized y (one shot)
        y_tmp = quantize_ste(y * scale) * rescale
        ctx = self.context_prediction(y_tmp)
        if self.scl2ctx:
            ctx = ctx + self.scale_to_context(
                jnp.reshape(1.0 / scale, (1, 1))
            ).reshape(1, 1, 1, -1)
        gaussian_params = self.entropy_parameters(
            jnp.concatenate([params, ctx], axis=-1)
        )
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)

        y_zm_sc = (y - means_hat) * scale
        signs = jax.lax.stop_gradient(jnp.sign(y_zm_sc))
        q_abs = quantize_ste(jnp.abs(y_zm_sc))
        q_stdev = self.gaussian_conditional.lower_bound_scale(scales_hat * scale)
        q_offsets = self._quant_offsets(q_abs, q_stdev, scale)
        y_hat = signs * (q_abs + q_offsets) * rescale + means_hat

        _, y_likelihoods = self.gaussian_conditional(
            y * scale, scales_hat * scale, means=means_hat * scale,
            training=training, key=k2,
        )
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    def _vbr_host_args(self, scale):
        import numpy as np

        from flashgmm_tpu.runtime.rasterscan import HostEntropyParameters

        s = float(np.asarray(jax.device_get(scale)))
        ctx_scl = np.asarray(
            jax.device_get(
                self.scale_to_context(jnp.asarray([[1.0 / s]], jnp.float32))
            )
        ).reshape(-1)

        mlp_layers = []
        for lin in self.QuantABCD.linears:
            mlp_layers.append((
                np.asarray(jax.device_get(lin.kernel.value)),
                np.asarray(jax.device_get(lin.bias.value)),
            ))

        def offset_fn(q_stdev, s_):
            v = np.stack(
                [q_stdev, np.full_like(q_stdev, s_)], axis=-1
            )
            for i, (w, b) in enumerate(mlp_layers):
                v = v @ w + b
                if i < len(mlp_layers) - 1:
                    v = np.maximum(v, 0)
            return -v[..., 0]

        return {
            "scale": s,
            "rescale": 1.0 / s,
            "ctx_scl": ctx_scl if self.scl2ctx else 0.0,
            "offset_fn": None if self.no_quantoffset else offset_fn,
            "scale_bound": self.gaussian_conditional.scale_bound,
        }

    def compress(self, x, stage: int = 2, s: int = 1, inputscale=0):
        import numpy as np

        from .google import JointAutoregressiveHierarchicalPriors as _Base
        from flashgmm_tpu.runtime.rasterscan import (
            raster_scan_compress_single_stream,
        )

        if stage == 1:
            return _Base.compress(self, x)
        scale = self._get_scale(s, inputscale)
        vbr = self._vbr_host_args(scale)

        y = self.g_a(x)
        z = self.h_a(y)
        z_strings = self.entropy_bottleneck.compress(z)
        z_hat = self.entropy_bottleneck.decompress(z_strings, z.shape[1:3])
        params = self.h_s(z_hat)

        ctx_conv, ep, tables, scale_table, scale_bound = self._host_ar_pieces()
        y_np = np.asarray(jax.device_get(y))
        params_np = np.asarray(jax.device_get(params))
        y_strings = [
            raster_scan_compress_single_stream(
                y_np[i], params_np[i], ctx_conv, ep, tables, scale_table,
                scale_bound, vbr=vbr,
            )
            for i in range(y_np.shape[0])
        ]
        return {"strings": [y_strings, z_strings], "shape": z.shape[1:3], "s": s}

    def decompress(self, strings, shape, stage: int = 2, s: int = 1,
                   inputscale=0):
        import numpy as np

        from .google import JointAutoregressiveHierarchicalPriors as _Base
        from flashgmm_tpu.runtime.rasterscan import (
            raster_scan_decompress_single_stream,
        )

        if stage == 1:
            return _Base.decompress(self, strings, shape)
        scale = self._get_scale(s, inputscale)
        vbr = self._vbr_host_args(scale)

        z_hat = self.entropy_bottleneck.decompress(strings[1], shape)
        params = self.h_s(z_hat)
        ctx_conv, ep, tables, scale_table, scale_bound = self._host_ar_pieces()
        params_np = np.asarray(jax.device_get(params))
        h, w = shape[0] * 4, shape[1] * 4
        y_hats = [
            raster_scan_decompress_single_stream(
                y_string, params_np[i], ctx_conv, ep, tables, scale_table,
                scale_bound, (h, w, self.M), vbr=vbr,
            )
            for i, y_string in enumerate(strings[0])
        ]
        y_hat = jnp.asarray(np.stack(y_hats))
        x_hat = jnp.clip(self.g_s(y_hat), 0.0, 1.0)
        return {"x_hat": x_hat}
