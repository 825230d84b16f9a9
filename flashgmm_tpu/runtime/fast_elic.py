"""Single-jit on-device codec for Elic2022GMM (SCCTX).

Same design as FastCheckerboardGmmCodec but over the ELIC structure:
5 uneven channel groups, each coded in 2 checkerboard passes conditioned on
the hyper side-params, the channel context of previously decoded groups,
and the spatial context of the group's anchors — 10 GMM symbol streams + z,
all inside one XLA program per direction.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from flashgmm_tpu.ans import interleaved as il
from flashgmm_tpu.ans.gaussian_cdf import get_approx_mode, gmm_guarded_rows

from .fast_codec import PassStream, StreamOverflow, _decode_pass, _encode_pass


class FastElicGmmCodec:
    def __init__(self, model, lanes: int = 512, max_abs: int = 47,
                 cap_divisor: int = 1):
        self.lanes = int(lanes)
        self.max_abs = int(max_abs)
        self.cap_divisor = int(cap_divisor)
        self.mode = get_approx_mode()
        self.groups = list(model.groups)
        self._graphdef, self._state = nnx.split(model)

        self._encode_jit = jax.jit(self._encode_impl)
        self._decode_jit = jax.jit(self._decode_impl, static_argnums=(2,))
        self._decode_y_jit = jax.jit(self._decode_y_impl, static_argnums=(2,))

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

    def _group_rows(self, ckbd, gmm_lc, y_ctx, side, lo, num_bins):
        scales, means, weights = self._pass_params(ckbd, gmm_lc, y_ctx, side)
        return gmm_guarded_rows(scales, means, weights, lo, num_bins, self.mode)

    # -- encode ----------------------------------------------------------------

    def _encode_impl(self, state, x):
        m, cg, hyper = self._modules(state)
        eb = hyper.entropy_bottleneck
        w_lanes = self.lanes
        lo = jnp.int32(-(self.max_abs + 1))
        num_bins = 2 * (self.max_abs + 1) + 1
        L = num_bins + 1

        y = m.g_a(x)
        z = hyper.h_a(y)

        med = eb._get_medians()[:, 0, 0]
        z_rows, z_off, z_maxbin = self._z_tables(eb)
        z_bin = jnp.clip(jnp.round(z - med).astype(jnp.int32) - z_off, 0, z_maxbin)
        z_hat = (z_bin + z_off).astype(jnp.float32) + med

        c_z = z.shape[-1]
        zb = z_bin.reshape(-1)
        n_spatial = zb.shape[0] // c_z
        # NHWC order: channel == flat index % C, so the per-symbol rows are a
        # plain tile of the per-channel tables (no gather)
        rows_per_sym = jnp.broadcast_to(
            z_rows[None], (n_spatial, c_z, z_rows.shape[1])
        ).reshape(-1, z_rows.shape[1])
        Lz = rows_per_sym.shape[-1]
        oh = jax.nn.one_hot(zb, Lz, dtype=jnp.int32)
        z_start = jnp.sum(rows_per_sym * oh, axis=1).astype(jnp.uint32)
        z_nxt = jnp.sum(
            rows_per_sym * jax.nn.one_hot(zb + 1, Lz, dtype=jnp.int32), axis=1
        )
        z_freq = (z_nxt - z_start.astype(jnp.int32)).astype(jnp.uint32)
        streams = [_encode_pass(zb, z_start, z_freq, w_lanes, 1)]

        side_all = hyper.h_s(z_hat)
        y_groups = cg._split(y)

        y_hat_groups = []
        for k in range(len(self.groups)):
            ckbd = cg.latent_codec[f"y{k}"]
            gmm_lc = ckbd.latent_codec["y"]
            params_k = cg._get_ctx_params(k, side_all, y_hat_groups)
            side = ckbd.unembed(params_k)
            y_ = ckbd.unembed(y_groups[k])
            y_hat_ = jnp.zeros_like(y_)
            for i in range(2):
                ctx = ckbd.unembed(
                    ckbd.context_prediction(ckbd.embed(y_hat_))
                )[i]
                if i == 0:
                    ctx = jnp.zeros_like(ctx)
                rows = self._group_rows(ckbd, gmm_lc, ctx, side[i], lo, num_bins)
                sym = jnp.clip(
                    jnp.round(y_[i]).astype(jnp.int32),
                    -self.max_abs, self.max_abs,
                )
                sym_flat = sym.reshape(-1)
                jbin = sym_flat - lo
                ohb = jax.nn.one_hot(jbin, L, dtype=jnp.int32)
                start = jnp.sum(rows * ohb, axis=1).astype(jnp.uint32)
                nxt = jnp.sum(
                    rows * jax.nn.one_hot(jbin + 1, L, dtype=jnp.int32), axis=1
                )
                freq = (nxt - start.astype(jnp.int32)).astype(jnp.uint32)
                streams.append(
                    _encode_pass(sym_flat, start, freq, w_lanes,
                                 self.cap_divisor)
                )
                y_hat_ = y_hat_.at[i].set(sym.astype(jnp.float32))
            y_hat_groups.append(ckbd.embed(y_hat_))

        y_hat = jnp.concatenate(y_hat_groups, axis=-1)
        return {"streams": streams, "y_hat": y_hat}

    # -- decode ----------------------------------------------------------------

    def _decode_y_impl(self, state, streams, shape):
        m, cg, hyper = self._modules(state)
        eb = hyper.entropy_bottleneck
        w_lanes = self.lanes
        lo = jnp.int32(-(self.max_abs + 1))
        num_bins = 2 * (self.max_abs + 1) + 1
        if len(shape) == 4:
            b, h, w, c = shape
        else:
            h, w, c = shape
            b = 1
        zh, zw = h // 4, w // 4

        med = eb._get_medians()[:, 0, 0]
        z_rows, z_off, z_maxbin = self._z_tables(eb)
        c_z = z_rows.shape[0]
        n_z = b * zh * zw * c_z
        rows_per_sym = jnp.broadcast_to(
            z_rows[None], (b * zh * zw, c_z, z_rows.shape[1])
        ).reshape(-1, z_rows.shape[1])
        z_bin = _decode_pass(streams[0], rows_per_sym, n_z, jnp.int32(0), w_lanes)
        z_hat = (z_bin.reshape(b, zh, zw, c_z) + z_off).astype(jnp.float32) + med

        side_all = hyper.h_s(z_hat)
        y_hat_groups = []
        si = 1
        for k in range(len(self.groups)):
            gk = self.groups[k]
            ckbd = cg.latent_codec[f"y{k}"]
            gmm_lc = ckbd.latent_codec["y"]
            params_k = cg._get_ctx_params(k, side_all, y_hat_groups)
            side = ckbd.unembed(params_k)
            y_hat_ = jnp.zeros((2, b, h, w // 2, gk), jnp.float32)
            for i in range(2):
                ctx = ckbd.unembed(
                    ckbd.context_prediction(ckbd.embed(y_hat_))
                )[i]
                if i == 0:
                    ctx = jnp.zeros_like(ctx)
                rows = self._group_rows(ckbd, gmm_lc, ctx, side[i], lo, num_bins)
                n = b * h * (w // 2) * gk
                sym = _decode_pass(streams[si], rows, n, lo, w_lanes)
                si += 1
                y_hat_ = y_hat_.at[i].set(
                    sym.reshape(b, h, w // 2, gk).astype(jnp.float32)
                )
            y_hat_groups.append(ckbd.embed(y_hat_))

        return jnp.concatenate(y_hat_groups, axis=-1)

    def _decode_impl(self, state, streams, shape):
        m, _, _ = self._modules(state)
        y_hat = self._decode_y_impl(state, streams, shape)
        return jnp.clip(m.g_s(y_hat), 0.0, 1.0)

    # -- public API --------------------------------------------------------------

    def encode(self, x):
        return self._encode_jit(self._state, x)

    def decode(self, streams, y_shape):
        return self._decode_jit(self._state, tuple(streams), tuple(y_shape))

    def decode_y_hat(self, streams, y_shape):
        return self._decode_y_jit(self._state, tuple(streams), tuple(y_shape))

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
