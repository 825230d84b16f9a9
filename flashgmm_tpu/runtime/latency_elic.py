"""Single-program low-latency codec for Elic2022GMM (SCCTX).

The composable FastElicGmmCodec needs ~28 program launches per direction
(5 groups x (ctx-params + 2x(rows + pass)) + z + side + g_s); on this
environment each launch carries a multi-ms fixed dispatch + tunnel cost,
which dominates ELIC's single-image latency (VERDICT r2: dec+g_s 95 ms).
Here the ENTIRE encode is ONE XLA program and the entire decode is ONE
XLA program — the group/pass sequencing is still serial *inside* the
program, but dispatch overhead is paid once.

Correctness model — certification, as in latency_codec.py: the fused
encoder and fused decoder compile their float CDF math independently, so
``encode_certified`` feeds the encoder's streams through the SAME
``_decode_full_jit`` executable ``decode()`` runs (identical shapes →
identical compiled program) and compares the decoded ``y_hat`` on-chip.
On certification failure or stream overflow it falls back to the
correct-by-construction composable codec, cross-certifying those bytes or
remembering them for routing through the fallback's own decoder.

Cites: reference Elic2022GMM real coding path
(compressai/latent_codecs/channel_groups.py:111-172,
checkerboard.py:275-330); the reference pays 10 serial C++ coder calls on
CPU instead.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .fast_codec import StreamOverflow, conv_backend_ctx
from .fast_elic import FastElicGmmCodec


class FastLatencyElicCodec(FastElicGmmCodec):
    """One-jit encode / one-jit decode around Elic2022GMM."""

    def __init__(self, model, lanes: int = 512, max_abs: int = 47,
                 cap_divisor: int = 1, bf16_transforms: bool = True,
                 fallback=None, pallas_decode: bool | None = None):
        # Decode backend: auto policy (Pallas kernel at W <= 512, scan
        # above), same as the composable codec. Round 4 had to pin the
        # scan: the Pallas custom call's forced operand layout propagated
        # into the rows-stage conv lowering and changed its MXU
        # accumulation by 1-2 ulp in groups 3-4 (tools/debug_elic_cert3.py).
        # Round 5 removed the hazard at the source — the rows-stage convs
        # are now themselves Mosaic kernels (canonical Pallas conv
        # backend, ops/pallas_conv.py), immune to surrounding layout
        # propagation. Certification still guards every stream and falls
        # back to the composable codec on any mismatch.
        super().__init__(model, lanes=lanes, max_abs=max_abs,
                         cap_divisor=cap_divisor,
                         bf16_transforms=bf16_transforms,
                         pallas_decode=pallas_decode)
        self._fallback = fallback  # FastElicGmmCodec or None
        self._fallback_digests = set()
        self._n_z_channels = self._z_channels()
        from .fast_codec import conv_ctx_wrap

        wrap = lambda impl: conv_ctx_wrap(self, impl)
        self._enc_full_jit = jax.jit(wrap(self._encode_full_impl),
                                     static_argnums=(2,))
        self._dec_full_jit = jax.jit(wrap(self._decode_full_impl),
                                     static_argnums=(2,))
        self._cmp_jit = jax.jit(lambda a, b: jnp.all(a == b))

    # -- fused programs -------------------------------------------------------

    def _encode_full_impl(self, state, x, cap_divisor):
        """ONE program: transforms, z pass, all 5x2 group passes.

        Every float stage interface (side_all, params_k, rows) is fenced
        with optimization_barrier so each stage is an isolated subgraph
        with pinned inputs: the decode program fences the same interfaces,
        and identical isolated subgraphs compile to identical float math.
        Without the fences XLA rematerializes these tensors per-consumer
        with program-specific fusion choices, and a one-ulp difference in
        a quantized CDF row silently desyncs the rANS streams (the same
        hazard class as fast_codec._analyze_impl's anti-remat barriers)."""
        ps_z, z_bin, syms = self._analyze_impl(state, x, cap_divisor)
        # canonical conv backend for the whole CDF->rows chain: the
        # side/ctx/params convs compile to identical Mosaic binaries in
        # the fused encode and decode programs (VERDICT r4 item 2)
        with conv_backend_ctx(self, canonical=True):
            side_all = jax.lax.optimization_barrier(
                self._side_impl(state, z_bin))
        streams = [ps_z]
        for k in range(len(self.groups)):
            with conv_backend_ctx(self, canonical=True):
                params_k = jax.lax.optimization_barrier(
                    self._ctxparams_impl(state, side_all, syms[: 2 * k], k)
                )
            sym0, sym1 = syms[2 * k], syms[2 * k + 1]
            with conv_backend_ctx(self, canonical=True):
                rows0 = jax.lax.optimization_barrier(
                    self._rows_impl(state, params_k, sym0, k, 0)
                )
            streams.append(
                self._encpass_impl(rows0, sym0.reshape(-1), cap_divisor)
            )
            with conv_backend_ctx(self, canonical=True):
                rows1 = jax.lax.optimization_barrier(
                    self._rows_impl(state, params_k, sym0, k, 1)
                )
            streams.append(
                self._encpass_impl(rows1, sym1.reshape(-1), cap_divisor)
            )
        m, cg, _ = self._modules(state)
        y_hat = jnp.concatenate(
            [self._embed_group(cg, k, syms[2 * k], syms[2 * k + 1])
             for k in range(len(self.groups))], axis=-1,
        )
        return tuple(streams), y_hat

    def _decode_full_impl(self, state, streams, y_shape):
        """ONE program: streams -> (x_hat, y_hat).

        Float stage interfaces fenced identically to _encode_full_impl —
        see its docstring for why (cross-program CDF bit-equality)."""
        b, h, w, c = y_shape
        z_bin = self._zdec_impl(
            state, streams[0], (b, h // 4, w // 4, self._n_z_channels)
        )
        with conv_backend_ctx(self, canonical=True):
            side_all = jax.lax.optimization_barrier(
                self._side_impl(state, z_bin))
        m, cg, _ = self._modules(state)
        syms = []
        si = 1
        for k in range(len(self.groups)):
            gk = self.groups[k]
            with conv_backend_ctx(self, canonical=True):
                params_k = jax.lax.optimization_barrier(
                    self._ctxparams_impl(state, side_all, tuple(syms), k)
                )
                rows0 = jax.lax.optimization_barrier(self._rows_impl(
                    state, params_k,
                    jnp.zeros((b, h, w // 2, gk), jnp.int32), k, 0
                ))
            sym0 = self._decpass_impl(rows0, streams[si]).reshape(
                b, h, w // 2, gk
            )
            si += 1
            with conv_backend_ctx(self, canonical=True):
                rows1 = jax.lax.optimization_barrier(
                    self._rows_impl(state, params_k, sym0, k, 1)
                )
            sym1 = self._decpass_impl(rows1, streams[si]).reshape(
                b, h, w // 2, gk
            )
            si += 1
            syms += [sym0, sym1]
        y_hat = jnp.concatenate(
            [self._embed_group(cg, k, syms[2 * k], syms[2 * k + 1])
             for k in range(len(self.groups))], axis=-1,
        )
        x_hat = self._gs_impl(state, y_hat)
        return x_hat, y_hat

    # -- public API -----------------------------------------------------------

    def _streams_match_decode_layout(self, streams, y_shape):
        caps = self.stream_capacities(y_shape)
        return [int(p.stream.shape[0]) for p in streams] == caps

    def _certify_streams_async(self, streams, y_shape, y_hat_expected):
        """Launch on-chip certification; returns a device bool with its
        host fetch already started (so callers can overlap other fetches
        before blocking on it), or False if the launch itself failed."""
        try:
            _, y_dec = self._dec_full_jit(self._state, tuple(streams),
                                          tuple(y_shape))
            ok = self._cmp_jit(y_dec, y_hat_expected)
            try:
                ok.copy_to_host_async()
            except AttributeError:
                pass
            return ok
        except Exception:
            return False

    def _certify_streams(self, streams, y_shape, y_hat_expected):
        return bool(self._certify_streams_async(streams, y_shape,
                                                y_hat_expected))

    def encode_certified(self, x):
        """Fused encode + certification against the production decoder.

        Returns (data bytes, y_shape); the bytes are ALWAYS decodable by
        ``decode()`` (see module docstring)."""
        streams, y_hat = self._enc_full_jit(self._state, x, self.cap_divisor)
        y_shape = tuple(y_hat.shape)
        # launch the on-chip certification and start ITS fetch before the
        # stream fetch wave, so the cert result rides the same tunnel
        # round trips instead of serializing in front of them
        # (cf. latency_codec.py's ok_dev pattern)
        ok_dev = None
        ok = None
        if self._streams_match_decode_layout(streams, y_shape):
            ok_dev = self._certify_streams_async(streams, y_shape, y_hat)
        for p in streams:
            for a in (p.n_words, p.states, p.stream):
                a.copy_to_host_async()
        try:
            data = self.to_bytes({"streams": list(streams)})
        except StreamOverflow:
            data = None
        if ok_dev is not None:
            ok = bool(ok_dev)
        if data is not None:
            if ok is None:
                ok = self._certify_streams(
                    self.from_bytes(data, y_shape), y_shape, y_hat
                )
            if ok:
                return data, y_shape
        return self._encode_fallback(x, y_shape)

    def _encode_fallback(self, x, y_shape):
        if self._fallback is None:
            from flax import nnx

            model = nnx.merge(self._graphdef, self._state)
            self._fallback = FastElicGmmCodec(
                model, lanes=self.lanes, max_abs=self.max_abs,
                cap_divisor=self.cap_divisor,
                bf16_transforms=self.bf16_transforms,
            )
        out = self._fallback.encode(x, full=True)
        data = self._fallback.to_bytes(out)
        if not self._certify_streams(
            self.from_bytes(data, y_shape), y_shape, out["y_hat"]
        ):
            import hashlib
            import warnings

            self._fallback_digests.add(hashlib.sha256(data).hexdigest())
            # per-instance digest memory: see latency_codec._encode_fallback
            warnings.warn(
                "ELIC latency-codec certification and cross-certification "
                "both failed; returning composable-codec bytes routed via "
                "in-memory digest. Decode these bytes in other processes "
                "with FastElicGmmCodec.decode.",
                RuntimeWarning,
            )
        return data, y_shape

    def decode_bytes(self, data: bytes, y_shape):
        """ONE program: bytes -> x_hat. Streams that failed
        cross-certification at encode time route through the fallback."""
        y_shape = tuple(y_shape)
        if self._fallback_digests:
            import hashlib

            if hashlib.sha256(data).hexdigest() in self._fallback_digests:
                streams = self._fallback.from_bytes(data, y_shape)
                return self._fallback.decode(streams, y_shape)
        streams = self.from_bytes(data, y_shape)
        x_hat, _ = self._dec_full_jit(self._state, tuple(streams), y_shape)
        return x_hat
