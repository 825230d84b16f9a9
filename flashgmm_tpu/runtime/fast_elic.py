"""Composable-jit on-device codec for Elic2022GMM (SCCTX).

Same correctness-by-construction design as FastCheckerboardGmmCodec: the
encode and decode pipelines invoke SHARED jitted sub-programs for every
float computation whose result must be bit-identical on both sides
(h_s side params, per-group channel-context + aggregation, per-pass
spatial context + entropy parameters -> quantized GMM CDF rows), so
bit-equality holds because both directions literally run the same
compiled executable.  The ELIC structure: 5 uneven channel groups, each
coded in 2 checkerboard passes -> 10 GMM symbol streams + z.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from flashgmm_tpu.ans import interleaved as il
from flashgmm_tpu.ans.gaussian_cdf import get_approx_mode, gmm_guarded_rows

from .fast_codec import (
    PassStream,
    StreamOverflow,
    _decode_pass,
    _encode_pass,
    apply_transform,
)


class FastElicGmmCodec:
    def __init__(self, model, lanes: int = 512, max_abs: int = 47,
                 cap_divisor: int = 1, bf16_transforms: bool = True,
                 pallas_decode: bool | None = None):
        self.lanes = int(lanes)
        from flashgmm_tpu.runtime.fast_codec import _pallas_decode_default

        self.pallas_decode = (
            _pallas_decode_default(self.lanes)
            if pallas_decode is None else bool(pallas_decode)
        )
        import os

        self.pallas_encode = os.environ.get(
            "FLASHGMM_PALLAS_ENCODE", "0") == "1"
        self.max_abs = int(max_abs)
        self.cap_divisor = int(cap_divisor)
        self.bf16_transforms = bool(bf16_transforms)
        self.mode = get_approx_mode()
        self.groups = list(model.groups)
        self._graphdef, self._state = nnx.split(model)
        self.data_sharding = None

        from flashgmm_tpu.runtime.fast_codec import conv_ctx_wrap

        wrap = lambda impl: conv_ctx_wrap(self, impl)
        canon = lambda impl: conv_ctx_wrap(self, impl, canonical=True)
        self._analyze_jit = jax.jit(wrap(self._analyze_impl),
                                    static_argnums=(2,))
        self._side_jit = jax.jit(canon(self._side_impl))
        # k is static: selects the per-group modules
        self._ctxparams_jit = jax.jit(canon(self._ctxparams_impl),
                                      static_argnums=(3,))
        # bound method: args are (state, params_k, sym0, k, i) -> k, i static
        self._rows_jit = jax.jit(canon(self._rows_impl),
                                 static_argnums=(3, 4))
        self._encpass_jit = jax.jit(self._encpass_impl, static_argnums=(2,))
        self._decpass_jit = jax.jit(self._decpass_impl)
        self._zdec_jit = jax.jit(self._zdec_impl, static_argnums=(2,))
        self._gs_jit = jax.jit(wrap(self._gs_impl))

    # -- plumbing --------------------------------------------------------------

    def _modules(self, state):
        m = nnx.merge(self._graphdef, state)
        cg = m.latent_codec["y"]  # ChannelGroupsLatentCodec
        hyper = m.latent_codec["hyper"]
        return m, cg, hyper

    def _z_tables(self, eb):
        cdf = eb.quantized_cdf.astype(jnp.int32)
        lengths = eb.cdf_length.astype(jnp.int32)
        L = cdf.shape[1]
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        rows = jnp.where(j < lengths[:, None], cdf, 65536)
        return rows, eb.offset.astype(jnp.int32), lengths - 2

    def _pass_params(self, ckbd, gmm_lc, y_ctx, side):
        p = ckbd.entropy_parameters(ckbd.merge(y_ctx, side))
        scales, means, weights = gmm_lc._chunk(p)
        weights = gmm_lc._reshape_gmm_weight(weights)
        K = gmm_lc.K

        def flat(v):
            b, h, w2, km = v.shape
            m_ch = km // K
            v = v.reshape(b, h, w2, K, m_ch)
            return jnp.moveaxis(v, 3, 4).reshape(-1, K)

        return (
            jnp.clip(flat(scales), 0.11, 256.0), flat(means), flat(weights)
        )

    def _lo_bins(self):
        lo = jnp.int32(-(self.max_abs + 1))
        num_bins = 2 * (self.max_abs + 1) + 1
        return lo, num_bins

    # -- jitted stages -----------------------------------------------------------

    def _analyze_impl(self, state, x, cap_divisor):
        """Encoder-only: transforms, quantization, and the z table pass.

        Returns (ps_z, z_bin, syms) with syms a flat tuple of per-group
        per-pass int32 symbol tensors [b, h, w/2, gk] in coding order."""
        m, cg, hyper = self._modules(state)
        eb = hyper.entropy_bottleneck

        y = apply_transform(m.g_a, x, self.bf16_transforms)
        z = apply_transform(hyper.h_a, y, self.bf16_transforms)

        med = eb._get_medians()[:, 0, 0]
        z_rows, z_off, z_maxbin = self._z_tables(eb)
        z_bin = jnp.clip(jnp.round(z - med).astype(jnp.int32) - z_off, 0, z_maxbin)
        # anti-rematerialization barrier (see fast_codec._analyze_impl)
        z_bin = jax.lax.optimization_barrier(z_bin)

        c_z = z.shape[-1]
        zb = z_bin.reshape(-1)
        n_spatial = zb.shape[0] // c_z
        rows_per_sym = jnp.broadcast_to(
            z_rows[None], (n_spatial, c_z, z_rows.shape[1])
        ).reshape(-1, z_rows.shape[1])
        # exact masked max-reduce (bf16 MXU one-hot-sum hazard; fast_codec)
        Lz2 = rows_per_sym.shape[-1]
        zcols = jax.lax.broadcasted_iota(jnp.int32, (1, Lz2), 1)
        z_start_i = jnp.max(
            jnp.where(zcols == zb[:, None], rows_per_sym, 0), axis=1)
        z_nxt = jnp.max(
            jnp.where(zcols == zb[:, None] + 1, rows_per_sym, 0), axis=1)
        z_start = z_start_i.astype(jnp.uint32)
        z_freq = (z_nxt - z_start_i).astype(jnp.uint32)
        ps_z = _encode_pass(zb, z_start, z_freq, self.lanes, 1,
                            self.pallas_encode)

        syms = []
        for k, yk in enumerate(cg._split(y)):
            ckbd = cg.latent_codec[f"y{k}"]
            y_ = ckbd.unembed(yk)
            sym = jnp.clip(
                jnp.round(y_).astype(jnp.int32), -self.max_abs, self.max_abs
            )  # [2, b, h, w/2, gk]
            sym = jax.lax.optimization_barrier(sym)  # anti-remat
            syms += [sym[0], sym[1]]
        return ps_z, z_bin, tuple(syms)

    def _side_impl(self, state, z_bin):
        """SHARED enc/dec: z_hat -> h_s (bit-identical by construction)."""
        m, cg, hyper = self._modules(state)
        eb = hyper.entropy_bottleneck
        med = eb._get_medians()[:, 0, 0]
        z_off = eb.offset.astype(jnp.int32)
        z_hat = (z_bin + z_off).astype(jnp.float32) + med
        return hyper.h_s(z_hat)

    def _embed_group(self, cg, k, sym0, sym1):
        """Integer symbols -> embedded group tensor (pure data movement,
        bit-exact in any program)."""
        ckbd = cg.latent_codec[f"y{k}"]
        return ckbd.embed(jnp.stack([sym0, sym1]).astype(jnp.float32))

    def _ctxparams_impl(self, state, side_all, prev_syms, k):
        """SHARED enc/dec: channel context of groups < k + aggregation.

        prev_syms: flat tuple (sym0_0, sym1_0, ..., sym0_{k-1}, sym1_{k-1})."""
        m, cg, hyper = self._modules(state)
        y_hat_prev = [
            self._embed_group(cg, j, prev_syms[2 * j], prev_syms[2 * j + 1])
            for j in range(k)
        ]
        return cg._get_ctx_params(k, side_all, y_hat_prev)

    def _rows_impl(self, state, params_k, sym0, k, i):
        """SHARED enc/dec: spatial context + EP -> guarded GMM rows for
        pass i of group k. sym0 is ignored for i == 0 (zero context)."""
        m, cg, hyper = self._modules(state)
        ckbd = cg.latent_codec[f"y{k}"]
        gmm_lc = ckbd.latent_codec["y"]
        lo, num_bins = self._lo_bins()
        side = ckbd.unembed(params_k)
        if i == 0:
            # zero context tensor, shaped to the context conv's output width
            ctx = jnp.zeros(
                side[0].shape[:-1] + (ckbd.context_prediction.out_ch,),
                jnp.float32,
            )
        else:
            y_hat_ = jnp.stack(
                [sym0.astype(jnp.float32), jnp.zeros_like(sym0, jnp.float32)]
            )
            ctx = ckbd.unembed(ckbd.context_prediction(ckbd.embed(y_hat_)))[1]
        scales, means, weights = self._pass_params(ckbd, gmm_lc, ctx, side[i])
        return gmm_guarded_rows(scales, means, weights, lo, num_bins, self.mode)

    def _encpass_impl(self, rows, sym_flat, cap_divisor):
        lo, num_bins = self._lo_bins()
        jbin = sym_flat - lo
        # exact masked max-reduce (bf16 MXU one-hot-sum hazard; fast_codec)
        L = rows.shape[-1]
        bins = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        start = jnp.max(jnp.where(bins == jbin[:, None], rows, 0), axis=1)
        nxt = jnp.max(jnp.where(bins == jbin[:, None] + 1, rows, 0), axis=1)
        freq = (nxt - start).astype(jnp.uint32)
        return _encode_pass(
            sym_flat, start.astype(jnp.uint32), freq, self.lanes, cap_divisor,
            self.pallas_encode,
        )

    def _decpass_impl(self, rows, ps):
        lo, _ = self._lo_bins()
        return _decode_pass(ps, rows, rows.shape[0], lo, self.lanes,
                            self.pallas_decode)

    def _zdec_impl(self, state, ps_z, zshape):
        m, cg, hyper = self._modules(state)
        eb = hyper.entropy_bottleneck
        z_rows, z_off, z_maxbin = self._z_tables(eb)
        b, zh, zw, c_z = zshape
        n_z = b * zh * zw * c_z
        rows_per_sym = jnp.broadcast_to(
            z_rows[None], (b * zh * zw, c_z, z_rows.shape[1])
        ).reshape(-1, z_rows.shape[1])
        z_bin = _decode_pass(ps_z, rows_per_sym, n_z, jnp.int32(0), self.lanes,
                             self.pallas_decode)
        return z_bin.reshape(b, zh, zw, c_z)

    def _gs_impl(self, state, y_hat):
        m, _, _ = self._modules(state)
        return jnp.clip(
            apply_transform(m.g_s, y_hat, self.bf16_transforms), 0.0, 1.0
        )

    @property
    def _embed_full_jit(self):
        if not hasattr(self, "_embed_full_cache"):
            def impl(state, syms):
                m, cg, hyper = self._modules(state)
                groups = [
                    self._embed_group(cg, k, syms[2 * k], syms[2 * k + 1])
                    for k in range(len(self.groups))
                ]
                return jnp.concatenate(groups, axis=-1)

            self._embed_full_cache = jax.jit(impl)
        return self._embed_full_cache

    # -- orchestration -----------------------------------------------------------

    def use_mesh(self, mesh, axis: str = "data", portable: bool = True):
        """Pin batch-data-parallel coding to a mesh; see
        FastCheckerboardGmmCodec.use_mesh for the contract. Portable mode
        (default) runs the side/ctx/rows/scan stages on the canonical
        single-device executables so SCCTX streams are byte-portable
        across topologies; ``portable=False`` restores the round-4
        all-SPMD mode."""
        if mesh is None:
            self.data_sharding = None
            return self
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.data_sharding = NamedSharding(mesh, P(axis, None, None, None))
        self.mesh_portable = bool(portable)
        return self

    def _maybe_shard(self, a):
        if self.data_sharding is None:
            return a
        return jax.device_put(a, self.data_sharding)

    def _canon(self, a):
        """See FastCheckerboardGmmCodec._canon."""
        if self.data_sharding is None:
            return a
        if getattr(self, "mesh_portable", True):
            return jax.device_put(a, self.data_sharding.mesh.devices.flat[0])
        return jax.device_put(a, self.data_sharding)

    def encode(self, x, full: bool = False):
        cd = 1 if full else self.cap_divisor
        x = self._maybe_shard(x)
        ps_z, z_bin, syms = self._analyze_jit(self._state, x, cd)
        z_bin = self._canon(z_bin)
        syms = tuple(self._canon(s) for s in syms)
        side_all = self._side_jit(self._state, z_bin)
        streams = [ps_z]
        for k in range(len(self.groups)):
            params_k = self._ctxparams_jit(
                self._state, side_all, syms[: 2 * k], k
            )
            sym0, sym1 = syms[2 * k], syms[2 * k + 1]
            rows0 = self._rows_jit(self._state, params_k, sym0, k, 0)
            streams.append(self._encpass_jit(rows0, sym0.reshape(-1), cd))
            rows1 = self._rows_jit(self._state, params_k, sym0, k, 1)
            streams.append(self._encpass_jit(rows1, sym1.reshape(-1), cd))
        y_hat = self._embed_full_jit(self._state, syms)
        return {"streams": streams, "y_hat": y_hat}

    def _decode_y(self, streams, shape):
        if len(shape) == 4:
            b, h, w, c = shape
        else:
            h, w, c = shape
            b = 1
        z_bin = self._canon(self._zdec_jit(
            self._state, streams[0], (b, h // 4, w // 4, self._z_channels())
        ))
        side_all = self._side_jit(self._state, z_bin)
        syms = []
        si = 1
        for k in range(len(self.groups)):
            gk = self.groups[k]
            params_k = self._ctxparams_jit(
                self._state, side_all, tuple(syms), k
            )
            rows0 = self._rows_jit(
                self._state, params_k,
                self._canon(jnp.zeros((b, h, w // 2, gk), jnp.int32)),
                k, 0
            )
            sym0 = self._canon(
                self._decpass_jit(rows0, streams[si]).reshape(b, h, w // 2, gk))
            si += 1
            rows1 = self._rows_jit(self._state, params_k, sym0, k, 1)
            sym1 = self._canon(
                self._decpass_jit(rows1, streams[si]).reshape(b, h, w // 2, gk))
            si += 1
            syms += [sym0, sym1]
        return self._embed_full_jit(self._state, tuple(syms))

    def decode_y_hat(self, streams, y_shape):
        return self._decode_y(tuple(streams), tuple(y_shape))

    def decode(self, streams, y_shape):
        y_hat = self._maybe_shard(self._decode_y(tuple(streams),
                                                 tuple(y_shape)))
        return self._gs_jit(self._state, y_hat)

    # -- serialization -------------------------------------------------------------

    def to_bytes(self, out):
        arrays = []
        for p in out["streams"]:
            arrays += [p.n_words, p.states, p.stream]
        for a in arrays:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        parts = []
        for i in range(0, len(arrays), 3):
            n = int(np.asarray(arrays[i]))
            stream = np.asarray(arrays[i + 2])
            if n > stream.shape[0]:
                raise StreamOverflow(f"stream {i // 3}: {n} > {stream.shape[0]}")
            parts.append(np.uint32(n).tobytes())
            parts.append(np.asarray(arrays[i + 1]).tobytes())
            parts.append(stream[:n].tobytes())
        return b"".join(parts)

    def stream_capacities(self, y_shape):
        if len(y_shape) == 4:
            b, h, w, c = y_shape
        else:
            h, w, c = y_shape
            b = 1
        caps = []
        n_z = b * (h // 4) * (w // 4) * self._z_channels()
        t_z, _ = il.layout(n_z, self.lanes)
        caps.append(t_z * self.lanes)
        for gk in self.groups:
            n = b * h * (w // 2) * gk
            t, _ = il.layout(n, self.lanes)
            cap = max(t * self.lanes // self.cap_divisor, self.lanes)
            caps += [cap, cap]
        return caps

    def _z_channels(self):
        m = nnx.merge(self._graphdef, self._state)
        return m.latent_codec["hyper"].entropy_bottleneck.channels

    def from_bytes(self, data: bytes, y_shape):
        caps = self.stream_capacities(y_shape)
        out = []
        off = 0
        w = self.lanes
        for cap in caps:
            n = int(np.frombuffer(data, np.uint32, 1, off)[0])
            off += 4
            states = np.frombuffer(data, np.uint32, w, off)
            off += w * 4
            words = np.frombuffer(data, np.uint16, n, off)
            off += n * 2
            if n > cap:
                cap = max(cap * self.cap_divisor, -(-n // w) * w)
            stream = np.zeros((cap,), np.uint16)
            stream[:n] = words
            out.append(PassStream(np.ascontiguousarray(states), stream, np.int32(n)))
        return out

    def num_bytes(self, out):
        ns = jax.device_get([p.n_words for p in out["streams"]])
        return sum(int(n) * 2 + self.lanes * 4 for n in ns)
