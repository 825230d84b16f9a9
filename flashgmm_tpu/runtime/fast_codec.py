"""Single-jit on-device codec for the checkerboard-GMM flagship model.

The reference pipeline (SURVEY.md §3.2-3.3) crosses the GPU->CPU boundary
with per-symbol tensors and runs a serial AVX2 coder; on this TPU setup a
single host sync costs ~30 ms, so the entire encode (g_a, hyper branch,
both checkerboard passes, and the rANS coding itself) compiles to ONE XLA
program, and likewise for decode. Only bitstream words cross the host
boundary.

Coding uses the on-device interleaved rANS (flashgmm_tpu/ans/interleaved.py)
with guarded GMM rows — FlashGMM's dynamic-CDF idea, vectorized over all
symbols and all bins at once instead of 8 AVX lanes.

The z branch is coded with the EntropyBottleneck's quantized CDF tables
(materialized by ``model.update()``), with symbols clamped into table range
(the reference escapes to bypass coding instead; here the tail bin absorbs
them — identical reconstruction, tail-mass rate cost ~1e-9).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from flashgmm_tpu.ans import interleaved as il
from flashgmm_tpu.ans.gaussian_cdf import (
    get_approx_mode,
    gmm_guarded_rows,
)


class StreamOverflow(RuntimeError):
    """Capped encode buffer exceeded (pathological input); retry with
    ``encode(x, full=True)``."""


class PassStream(NamedTuple):
    states: jnp.ndarray  # uint32 [W]
    stream: jnp.ndarray  # uint16 [cap]
    n_words: jnp.ndarray  # int32 scalar


def _encode_pass(values, start, freq, w: int, cap_divisor: int = 4):
    """Encode one symbol stream; the returned buffer is statically capped at
    ``T*W // cap_divisor`` words (~16/cap_divisor bits/symbol) to shrink the
    device->host fetch. ``n_words`` exceeding the cap signals overflow (the
    caller re-runs the uncapped variant — pathological inputs only)."""
    n = values.shape[0]
    t, _ = il.layout(n, w)
    states, words, emits = il.encode_scan(
        il.to_lanes(start, w), il.to_lanes(freq, w), il.active_mask(n, t, w)
    )
    stream, n_words = il.pack_words(words, emits)
    cap = max(t * w // cap_divisor, w)
    return PassStream(states, stream[:cap], n_words)


def _decode_pass(ps: PassStream, rows, n: int, lo, w: int):
    t, _ = il.layout(n, w)
    active = il.active_mask(n, t, w)
    rows_l = il.to_lanes(rows, w, fill=0)
    # make padding rows valid monotone tables so the scan math stays in range
    L = rows.shape[-1]
    dummy = (jnp.arange(L, dtype=jnp.int32) * (65536 // (L - 1))).clip(0, 65536)
    rows_l = jnp.where(active[..., None], rows_l, dummy)
    symbols = il.decode_scan(ps.states, ps.stream, rows_l, active, lo)
    return il.from_lanes(symbols, n)


class FastCheckerboardGmmCodec:
    """Jitted encode/decode around a Cheng2020AnchorCheckerboardGMMv2."""

    def __init__(self, model, lanes: int = 128, max_abs: int = 47,
                 cap_divisor: int = 4):
        self.lanes = int(lanes)
        self.max_abs = int(max_abs)  # symbols clamped to [-max_abs, max_abs]
        self.cap_divisor = int(cap_divisor)
        self.mode = get_approx_mode()
        self._graphdef, self._state = nnx.split(model)

        self._encode_jit = jax.jit(
            functools.partial(self._encode_impl, cap_divisor=self.cap_divisor)
        )
        self._encode_full_jit = jax.jit(
            functools.partial(self._encode_impl, cap_divisor=1)
        )
        self._decode_jit = jax.jit(self._decode_impl, static_argnums=(4,))
        self._decode_y_jit = jax.jit(self._decode_y_impl, static_argnums=(4,))

    # -- shared pieces -------------------------------------------------------

    def _modules(self, state):
        m = nnx.merge(self._graphdef, state)
        ckbd = m.latent_codec["y"]
        hyper = m.latent_codec["hyper"]
        gmm_lc = ckbd.latent_codec["y"]
        return m, ckbd, hyper, gmm_lc

    def _z_tables(self, eb):
        """(rows [C, L] int32, offsets [C], max_bin [C]) from EB buffers."""
        cdf = eb.quantized_cdf.astype(jnp.int32)  # [C, Lmax]
        lengths = eb.cdf_length.astype(jnp.int32)  # [C]
        L = cdf.shape[1]
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        rows = jnp.where(j < lengths[:, None], cdf, 65536)
        offsets = eb.offset.astype(jnp.int32)
        max_bin = lengths - 2  # last valid bin index
        return rows, offsets, max_bin

    def _gmm_pass_params(self, ckbd, gmm_lc, y_ctx, side):
        """EP -> per-symbol [N, K] (scales, means, weights), NHWC-ravel
        symbol order."""
        p = ckbd.entropy_parameters(ckbd.merge(y_ctx, side))
        scales, means, weights = gmm_lc._chunk(p)
        weights = gmm_lc._reshape_gmm_weight(weights)

        K = gmm_lc.K

        def flat(v):
            b, h, w2, km = v.shape
            m_ch = km // K
            v = v.reshape(b, h, w2, K, m_ch)
            v = jnp.moveaxis(v, 3, 4)  # [b, h, w2, M, K]
            return v.reshape(-1, K)

        return (
            jnp.clip(flat(scales), 0.11, 256.0),
            flat(means),
            flat(weights),
        )

    # -- encode --------------------------------------------------------------

    def _encode_impl(self, state, x, cap_divisor: int = 4):
        m, ckbd, hyper, gmm_lc = self._modules(state)
        eb = hyper.entropy_bottleneck
        w_lanes = self.lanes
        lo = jnp.int32(-(self.max_abs + 1))
        num_bins = 2 * (self.max_abs + 1) + 1

        y = m.g_a(x)
        z = hyper.h_a(y)

        # -- z branch (table-coded, clamped into range)
        med = eb._get_medians()[:, 0, 0]
        z_rows, z_off, z_maxbin = self._z_tables(eb)
        z_bin_raw = jnp.round(z - med).astype(jnp.int32) - z_off
        z_bin = jnp.clip(z_bin_raw, 0, z_maxbin)
        z_hat = (z_bin + z_off).astype(jnp.float32) + med

        c_z = z.shape[-1]
        zb = z_bin.reshape(-1)
        n_spatial = zb.shape[0] // c_z
        # NHWC order: channel == flat index % C, so the per-symbol rows are a
        # plain tile of the per-channel tables (no gather)
        rows_per_sym = jnp.broadcast_to(
            z_rows[None], (n_spatial, c_z, z_rows.shape[1])
        ).reshape(-1, z_rows.shape[1])  # [Nz, Lz]
        Lz = rows_per_sym.shape[-1]
        oh = jax.nn.one_hot(zb, Lz, dtype=jnp.int32)
        z_start = jnp.sum(rows_per_sym * oh, axis=1).astype(jnp.uint32)
        z_nxt = jnp.sum(
            rows_per_sym * jax.nn.one_hot(zb + 1, Lz, dtype=jnp.int32), axis=1
        )
        z_freq = (z_nxt - z_start.astype(jnp.int32)).astype(jnp.uint32)
        # z is ~10% of the payload; not worth the overflow risk of capping
        ps_z = _encode_pass(zb + 0, z_start, z_freq, w_lanes, 1)

        # -- hyper params + checkerboard passes
        params = hyper.h_s(z_hat)
        side = ckbd.unembed(params)
        y_ = ckbd.unembed(y)

        streams = []
        y_hat_ = jnp.zeros_like(y_)
        for i in range(2):
            ctx = ckbd.unembed(ckbd.context_prediction(ckbd.embed(y_hat_)))[i]
            if i == 0:
                ctx = jnp.zeros_like(ctx)
            scales, means, weights = self._gmm_pass_params(
                ckbd, gmm_lc, ctx, side[i]
            )
            sym = jnp.clip(
                jnp.round(y_[i]).astype(jnp.int32), -self.max_abs, self.max_abs
            )
            sym_flat = sym.reshape(-1)
            # Select (start, freq) from the SAME rows subgraph the decoder
            # runs (bit-equal quantized CDFs; see gmm_guarded_rows).
            rows = gmm_guarded_rows(
                scales, means, weights, lo, num_bins, self.mode
            )
            L = num_bins + 1
            jbin = sym_flat - lo
            oh = jax.nn.one_hot(jbin, L, dtype=jnp.int32)
            start = jnp.sum(rows * oh, axis=1)
            nxt = jnp.sum(rows * jax.nn.one_hot(jbin + 1, L, dtype=jnp.int32), axis=1)
            freq = (nxt - start).astype(jnp.uint32)
            streams.append(
                _encode_pass(
                    sym_flat, start.astype(jnp.uint32), freq, w_lanes, cap_divisor
                )
            )
            y_hat_ = y_hat_.at[i].set(sym.astype(jnp.float32))

        y_hat = ckbd.embed(y_hat_)
        return {
            "z": ps_z,
            "y0": streams[0],
            "y1": streams[1],
            "y_hat": y_hat,
        }

    # -- decode --------------------------------------------------------------

    def _decode_impl(self, state, ps_z, ps_y0, ps_y1, shape):
        m, _, _, _ = self._modules(state)
        y_hat = self._decode_y_impl(state, ps_z, ps_y0, ps_y1, shape)
        return jnp.clip(m.g_s(y_hat), 0.0, 1.0)

    def _decode_y_impl(self, state, ps_z, ps_y0, ps_y1, shape):
        """shape: static (h, w, c) of y, or (b, h, w, c) for a batch."""
        m, ckbd, hyper, gmm_lc = self._modules(state)
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

        # -- z branch
        med = eb._get_medians()[:, 0, 0]
        z_rows, z_off, z_maxbin = self._z_tables(eb)
        c_z = z_rows.shape[0]
        n_z = b * zh * zw * c_z
        rows_per_sym = jnp.broadcast_to(
            z_rows[None], (b * zh * zw, c_z, z_rows.shape[1])
        ).reshape(-1, z_rows.shape[1])
        z_bin = _decode_pass(ps_z, rows_per_sym, n_z, jnp.int32(0), w_lanes)
        z_hat = (
            z_bin.reshape(b, zh, zw, c_z) + z_off
        ).astype(jnp.float32) + med

        params = hyper.h_s(z_hat)
        side = ckbd.unembed(params)

        y_hat_ = jnp.zeros((2, b, h, w // 2, c), jnp.float32)
        for i, ps in enumerate((ps_y0, ps_y1)):
            ctx = ckbd.unembed(ckbd.context_prediction(ckbd.embed(y_hat_)))[i]
            if i == 0:
                ctx = jnp.zeros_like(ctx)
            scales, means, weights = self._gmm_pass_params(
                ckbd, gmm_lc, ctx, side[i]
            )
            rows = gmm_guarded_rows(scales, means, weights, lo, num_bins, self.mode)
            n = b * h * (w // 2) * c
            sym = _decode_pass(ps, rows, n, lo, w_lanes)
            y_hat_ = y_hat_.at[i].set(
                sym.reshape(b, h, w // 2, c).astype(jnp.float32)
            )

        return ckbd.embed(y_hat_)

    # -- public API ----------------------------------------------------------

    def encode(self, x, full: bool = False):
        """Returns device-side dict; call ``to_bytes`` for serialization.

        ``full=True`` disables the stream cap (used as the overflow
        fallback for pathological inputs)."""
        if full:
            return self._encode_full_jit(self._state, x)
        return self._encode_jit(self._state, x)

    def decode(self, out_or_streams, y_shape):
        ps_z, ps_y0, ps_y1 = (
            out_or_streams["z"], out_or_streams["y0"], out_or_streams["y1"]
        )
        return self._decode_jit(self._state, ps_z, ps_y0, ps_y1, y_shape)

    def decode_y_hat(self, out_or_streams, y_shape):
        ps_z, ps_y0, ps_y1 = (
            out_or_streams["z"], out_or_streams["y0"], out_or_streams["y1"]
        )
        return self._decode_y_jit(self._state, ps_z, ps_y0, ps_y1, y_shape)

    def stream_capacities(self, y_shape):
        """(cap_z, cap_y) capped stream lengths for latent y_shape =
        (h, w, c) or (b, h, w, c)."""
        if len(y_shape) == 4:
            b, h, w, c = y_shape
        else:
            h, w, c = y_shape
            b = 1
        n_y = b * h * (w // 2) * c
        n_z = b * (h // 4) * (w // 4) * self._z_channels()
        t_y, _ = il.layout(n_y, self.lanes)
        t_z, _ = il.layout(n_z, self.lanes)
        cd = self.cap_divisor
        return (
            t_z * self.lanes,  # z is never capped
            max(t_y * self.lanes // cd, self.lanes),
        )

    def _z_channels(self):
        m = nnx.merge(self._graphdef, self._state)
        return m.latent_codec["hyper"].entropy_bottleneck.channels

    def from_bytes(self, data: bytes, y_shape):
        """Parse ``to_bytes`` output back into device-side pass streams."""
        cap_z, cap_y = self.stream_capacities(y_shape)
        caps = (cap_z, cap_y, cap_y)
        names = ("z", "y0", "y1")
        out = {}
        off = 0
        for name, cap in zip(names, caps):
            n = int(np.frombuffer(data, np.uint32, 1, off)[0])
            off += 4
            states = np.frombuffer(data, np.uint32, self.lanes, off)
            off += self.lanes * 4
            words = np.frombuffer(data, np.uint16, n, off)
            off += n * 2
            if n > cap:
                # overflow file: use the single uncapped capacity so decode
                # shapes stay stable (avoids per-file recompilation)
                cap = max(cap * self.cap_divisor, -(-n // self.lanes) * self.lanes)
            stream = np.zeros((cap,), np.uint16)
            stream[:n] = words
            # hand numpy straight to the decode jit (implicit async H2D)
            out[name] = PassStream(
                np.ascontiguousarray(states), stream, np.int32(n)
            )
        return out

    # -- packed single-transfer decode path -----------------------------------

    def _packed_layout(self, y_shape):
        """Offsets (in u32 words) of each pass inside the packed buffer."""
        cap_z, cap_y = self.stream_capacities(y_shape)
        w = self.lanes
        sizes = [1 + w + cap_z // 2, 1 + w + cap_y // 2, 1 + w + cap_y // 2]
        offs = [0, sizes[0], sizes[0] + sizes[1]]
        return offs, sizes, (cap_z, cap_y, cap_y)

    def decode_bytes(self, data: bytes, y_shape):
        """One host->device transfer: all three pass streams packed into a
        single uint32 buffer, unpacked on device inside the decode jit."""
        offs, sizes, caps = self._packed_layout(y_shape)
        w = self.lanes
        packed = np.zeros(sum(sizes), np.uint32)
        off_bytes = 0
        for slot, cap in zip(offs, caps):
            n = int(np.frombuffer(data, np.uint32, 1, off_bytes)[0])
            off_bytes += 4
            if n > cap:
                # overflow file: fall back to the unpacked path
                return self.decode(self.from_bytes(data, y_shape), y_shape)
            states = np.frombuffer(data, np.uint32, w, off_bytes)
            off_bytes += w * 4
            words = np.frombuffer(data, np.uint16, n, off_bytes)
            off_bytes += n * 2
            packed[slot] = n
            packed[slot + 1 : slot + 1 + w] = states
            u16 = np.zeros(cap, np.uint16)
            u16[:n] = words
            packed[slot + 1 + w : slot + 1 + w + cap // 2] = u16.view(np.uint32)
        return self._decode_packed_jit(self._state, packed, tuple(y_shape))

    @functools.cached_property
    def _decode_packed_jit(self):
        def impl(state, packed, y_shape):
            offs, sizes, caps = self._packed_layout(y_shape)
            w = self.lanes
            passes = []
            for slot, cap in zip(offs, caps):
                n = packed[slot].astype(jnp.int32)
                states = packed[slot + 1 : slot + 1 + w]
                u32s = packed[slot + 1 + w : slot + 1 + w + cap // 2]
                lo16 = (u32s & jnp.uint32(0xFFFF)).astype(jnp.uint16)
                hi16 = (u32s >> 16).astype(jnp.uint16)
                stream = jnp.stack([lo16, hi16], axis=1).reshape(-1)
                passes.append(PassStream(states, stream, n))
            m, _, _, _ = self._modules(state)
            y_hat = self._decode_y_impl(state, *passes, y_shape)
            return jnp.clip(m.g_s(y_hat), 0.0, 1.0)

        return jax.jit(impl, static_argnums=(2,))

    def to_bytes(self, out):
        """Fetch the three streams and pack into a single byte string.

        Uses async host copies so the three fetches overlap (the tunnel has
        a high fixed per-transfer latency)."""
        arrays = []
        for p in (out["z"], out["y0"], out["y1"]):
            arrays += [p.n_words, p.states, p.stream]
        for a in arrays:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        parts = []
        for i in range(0, 9, 3):
            n = int(np.asarray(arrays[i]))
            stream = np.asarray(arrays[i + 2])
            if n > stream.shape[0]:
                raise StreamOverflow(
                    f"pass stream overflow ({n} > {stream.shape[0]} words); "
                    "re-encode with encode(x, full=True)"
                )
            parts.append(np.uint32(n).tobytes())
            parts.append(np.asarray(arrays[i + 1]).tobytes())
            parts.append(stream[:n].tobytes())
        return b"".join(parts)

    def encode_to_bytes(self, x):
        """encode + to_bytes with automatic overflow fallback."""
        out = self.encode(x)
        try:
            return self.to_bytes(out), out
        except StreamOverflow:
            out = self.encode(x, full=True)
            return self.to_bytes(out), out

    def num_bytes(self, out):
        fetched = jax.device_get(
            [p.n_words for p in (out["z"], out["y0"], out["y1"])]
        )
        return sum(int(n) * 2 + self.lanes * 4 for n in fetched)
