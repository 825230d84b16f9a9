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
import os
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


def _prefetch(ps):
    """Start the device->host copies for a pass stream ASAP: the tunnel's
    fixed D2H latency (~30-45 ms) then overlaps the remaining on-chip
    passes instead of serializing after them."""
    for a in (ps.n_words, ps.states, ps.stream):
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass
    return ps


class PassStream(NamedTuple):
    states: jnp.ndarray  # uint32 [W]
    stream: jnp.ndarray  # uint16 [cap]
    n_words: jnp.ndarray  # int32 scalar


def apply_transform(mod, x, bf16: bool):
    """Run an analysis/synthesis transform (g_a / h_a / g_s), optionally in
    bfloat16. Safe for any transform that does NOT need bit-equality across
    the encode and decode programs (the entropy-parameter path from z_hat
    onward must stay fenced f32 — see FastCheckerboardGmmCodec._gmm_pass_params)."""
    if not bf16:
        return mod(x)
    gd, st = nnx.split(mod)
    st = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and v.dtype == jnp.float32
        else v,
        st,
    )
    return nnx.merge(gd, st)(x.astype(jnp.bfloat16)).astype(jnp.float32)


def conv_backend_ctx(codec, canonical=False):
    """Context for tracing a codec's jit programs: route eligible convs
    through the hand-tiled Pallas kernel (ops/pallas_conv.py).

    On by default on TPU, single-device (FLASHGMM_PALLAS_CONV=0 restores
    XLA convs). Besides the ~2x MFU win on g_a/g_s, a Mosaic kernel
    compiles to the same binary in every enclosing program — so the
    CDF->rows conv chain (h_s, context prediction, entropy parameters)
    produces bitwise-identical rows in the encode, decode, latency, and
    certification programs, removing the cross-program fusion hazard
    (VERDICT r4 item 2).

    Only the ``canonical=True`` stages (the side/rows chain) take the
    kernel by default: there its job is bitwise reproducibility and the
    convs are thin. The transform stages (g_a/h_a/g_s) keep XLA convs —
    measured on the v5e (results/synthetic/pallas_conv_bench.json), XLA's
    batched convs already run at 40-68% MFU and beat the hand kernel ~2x
    (the r4 "29% MFU" figure measured whole transforms incl. GDN and
    elementwise traffic, not the convs); opt in to Pallas transforms with
    FLASHGMM_PALLAS_CONV_TRANSFORMS=1 (single-image parity, batched
    slower). Under a mesh the canonical stages still take the kernel in
    portable mode (they trace for single-device inputs and must dispatch
    the SAME executables as unsharded codecs — byte portability)."""
    import os

    from flashgmm_tpu.ops.pallas_conv import use_pallas_conv

    meshless = getattr(codec, "data_sharding", None) is None
    if canonical:
        on = (
            os.environ.get("FLASHGMM_PALLAS_CONV", "1") == "1"
            and jax.default_backend() == "tpu"
            and (meshless or getattr(codec, "mesh_portable", True))
        )
    else:
        on = (
            os.environ.get("FLASHGMM_PALLAS_CONV_TRANSFORMS", "0") == "1"
            and os.environ.get("FLASHGMM_PALLAS_CONV", "1") == "1"
            and jax.default_backend() == "tpu"
            and meshless
        )
    return use_pallas_conv(on)


def conv_ctx_wrap(codec, impl, canonical=False):
    """Wrap a codec jit-impl so it traces under the codec's conv-backend
    context (see conv_backend_ctx)."""
    import functools

    @functools.wraps(impl)
    def wrapped(*a, **k):
        with conv_backend_ctx(codec, canonical):
            return impl(*a, **k)

    return wrapped


def _encode_pass(values, start, freq, w: int, cap_divisor: int = 4,
                 pallas: bool = False):
    """Encode one symbol stream; the returned buffer is statically capped at
    ``T*W // cap_divisor`` words (~16/cap_divisor bits/symbol) to shrink the
    device->host fetch. ``n_words`` exceeding the cap signals overflow (the
    caller re-runs the uncapped variant — pathological inputs only)."""
    n = values.shape[0]
    t, _ = il.layout(n, w)
    args = (il.to_lanes(start, w), il.to_lanes(freq, w),
            il.active_mask(n, t, w))
    if pallas and w % 128 == 0:  # Mosaic kernel needs full 128-lane blocks
        from flashgmm_tpu.ans.pallas_coder import encode_scan_pallas

        states, words, emits = encode_scan_pallas(*args)
    else:
        states, words, emits = il.encode_scan(*args)
    stream, n_words = il.pack_words(words, emits)
    cap = max(t * w // cap_divisor, w)
    return PassStream(states, stream[:cap], n_words)


def _pallas_decode_default(w: int) -> bool:
    """Decoder-backend default: the Pallas Mosaic kernel on real TPU when
    the lane count allows it (w % 128 == 0), the XLA scan otherwise.
    Override with FLASHGMM_PALLAS_DECODE=0/1.

    Measured on the v5e (tools/profile_pallas_variants.py): the Pallas
    kernel wins at W <= 512 (0.39 vs 2.36 ms at W=512, T=384) where the
    [W, W] triangular rank rides the MXU; at W >= 1024 the XLA scan's
    fewer-steps advantage wins (0.60 vs 2.47 ms at W=1024). CAVEAT for
    batched use: the advantage lives at single-image T = n/W; with a
    ~batch x larger n the scan wins at EVERY lane count
    (tools/sweep_batch_lanes.py, batch-24: dec 13.5 scan vs 22.9 pallas
    ms/img at W=512; 11.9 vs 14.1 at 1024) — but batch throughput also
    wants big lanes in the first place (bench.py uses 4096, where the
    auto-default already picks the scan), so small-W batched coding is a
    config nobody should run; pass pallas_decode=False if you must."""
    import os

    v = os.environ.get("FLASHGMM_PALLAS_DECODE", "auto")
    if v in ("0", "1"):
        return v == "1"
    return w % 128 == 0 and w <= 512 and jax.default_backend() == "tpu"


def _decode_pass(ps: PassStream, rows, n: int, lo, w: int,
                 pallas: bool = False):
    t, _ = il.layout(n, w)
    active = il.active_mask(n, t, w)
    rows_l = il.to_lanes(rows, w, fill=0)
    # make padding rows valid monotone tables so the scan math stays in range
    L = rows.shape[-1]
    dummy = (jnp.arange(L, dtype=jnp.int32) * (65536 // (L - 1))).clip(0, 65536)
    rows_l = jnp.where(active[..., None], rows_l, dummy)
    if pallas and w % 128 == 0:  # Mosaic kernel needs full 128-lane blocks
        from flashgmm_tpu.ans.pallas_coder import decode_scan_pallas

        symbols = decode_scan_pallas(ps.states, ps.stream, rows_l, active, lo)
    else:
        symbols = il.decode_scan(ps.states, ps.stream, rows_l, active, lo)
    return il.from_lanes(symbols, n)


class FastCheckerboardGmmCodec:
    """Composable-jit encode/decode around a Cheng2020AnchorCheckerboardGMMv2.

    Correctness-by-construction design: encoding and decoding are SEPARATE
    XLA programs, but every float computation whose result must be
    bit-identical on both sides (z_hat -> h_s -> context -> entropy
    parameters -> quantized GMM CDF rows) runs in a SHARED jitted
    sub-program (`_side_jit`, `_rows0_jit`, `_rows1_jit`) that both
    directions invoke — the same compiled executable trivially produces the
    same bits, with no reliance on cross-program compiler determinism
    (optimization_barrier fencing proved insufficient: layout/fusion
    context still perturbed conv results at the ULP level and desynced the
    rANS streams).  The analysis/synthesis transforms (bf16) and the rANS
    scan passes live in their own programs around those.  All intermediates
    stay on device; dispatch overhead is ~0.3 ms per program, amortized
    over the batch.
    """

    def __init__(self, model, lanes: int = 128, max_abs: int = 47,
                 cap_divisor: int = 4, bf16_transforms: bool = True,
                 pallas_decode: bool | None = None):
        self.lanes = int(lanes)
        # decode-backend choice is static per codec (baked into the jits)
        self.pallas_decode = (
            _pallas_decode_default(self.lanes)
            if pallas_decode is None else bool(pallas_decode)
        )
        # encoder backend: XLA scan unless explicitly flipped (the Pallas
        # encoder is correctness-proven but not yet faster at batch W)
        self.pallas_encode = os.environ.get(
            "FLASHGMM_PALLAS_ENCODE", "0") == "1"

        self.max_abs = int(max_abs)  # symbols clamped to [-max_abs, max_abs]
        self.cap_divisor = int(cap_divisor)
        # g_a/h_a/g_s run in bfloat16 on the MXU: they never need
        # bit-equality across programs (their outputs are quantized or are
        # final pixels). ~2x on the conv FLOPs.
        self.bf16_transforms = bool(bf16_transforms)
        self.mode = get_approx_mode()
        self._graphdef, self._state = nnx.split(model)

        # multi-device batch coding: explicit sharding pinned at every
        # program boundary (see use_mesh); set before the jits so the
        # conv-backend gate can read it at trace time
        self.data_sharding = None

        wrap = lambda impl: conv_ctx_wrap(self, impl)
        canon = lambda impl: conv_ctx_wrap(self, impl, canonical=True)
        self._analyze_jit = jax.jit(wrap(self._analyze_impl),
                                    static_argnums=(2,))
        self._side_jit = jax.jit(canon(self._side_impl))
        self._rows0_jit = jax.jit(canon(self._rows0_impl))
        self._rows1_jit = jax.jit(canon(self._rows1_impl))
        self._encpass_jit = jax.jit(self._encpass_impl, static_argnums=(2,))
        self._decpass_jit = jax.jit(self._decpass_impl)
        self._zdec_jit = jax.jit(self._zdec_impl, static_argnums=(2,))
        self._embed_jit = jax.jit(self._embed_impl)
        self._gs_jit = jax.jit(wrap(self._gs_impl))

    def use_mesh(self, mesh, axis: str = "data", portable: bool = True):
        """Pin the codec to a device mesh for batch-data-parallel coding.

        ``portable=True`` (default): the heavy transforms (g_a/h_a/g_s)
        run sharded over the mesh, but every stage whose float math
        determines stream bytes — h_s, context, entropy parameters, CDF
        rows, and the rANS scans — runs on the CANONICAL single-device
        executables (boundary tensors are integer symbols, so gathering
        them to one device is lossless). Streams are therefore
        byte-portable across topologies: a stream encoded unsharded
        decodes exactly on any mesh and vice versa (VERDICT r4 item 2b).
        The rows stages are thin next to the transforms, so the perf cost
        is small.

        ``portable=False`` restores the round-4 all-SPMD mode: every
        stage compiles for sharded inputs and both directions dispatch to
        identical SPMD executables — self-consistent on the SAME topology
        (exact y_hat round-trip) but streams are tied to that topology.

        Call with ``mesh=None`` to return to single-device.
        """
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
        """Place a coding-boundary tensor for the rows/scan stages: on the
        canonical single device in portable mode (dispatching the SAME
        executables as unsharded codecs — byte portability), or sharded in
        the round-4 all-SPMD mode."""
        if self.data_sharding is None:
            return a
        if getattr(self, "mesh_portable", True):
            return jax.device_put(a, self.data_sharding.mesh.devices.flat[0])
        return jax.device_put(a, self.data_sharding)

    # -- shared pieces -------------------------------------------------------

    def _modules(self, state):
        m = nnx.merge(self._graphdef, state)
        ckbd = m.latent_codec["y"]
        hyper = m.latent_codec["hyper"]
        gmm_lc = ckbd.latent_codec["y"]
        return m, ckbd, hyper, gmm_lc

    def _transform(self, mod, x):
        """Apply an analysis/synthesis transform, in bf16 when enabled."""
        return apply_transform(mod, x, self.bf16_transforms)

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

    def _z_rows_per_sym(self, z_rows, n_spatial):
        """NHWC order: channel == flat index % C, so per-symbol rows are a
        plain tile of the per-channel tables (no gather)."""
        c_z = z_rows.shape[0]
        return jnp.broadcast_to(
            z_rows[None], (n_spatial, c_z, z_rows.shape[1])
        ).reshape(-1, z_rows.shape[1])

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

    def _lo_bins(self):
        lo = jnp.int32(-(self.max_abs + 1))
        num_bins = 2 * (self.max_abs + 1) + 1
        return lo, num_bins

    # -- jitted stages ---------------------------------------------------------

    def _analyze_impl(self, state, x, cap_divisor):
        """Encoder-only: transforms + quantization + the z table pass."""
        m, ckbd, hyper, gmm_lc = self._modules(state)
        eb = hyper.entropy_bottleneck

        y = self._transform(m.g_a, x)
        z = self._transform(hyper.h_a, y)

        med = eb._get_medians()[:, 0, 0]
        z_rows, z_off, z_maxbin = self._z_tables(eb)
        z_bin = jnp.clip(
            jnp.round(z - med).astype(jnp.int32) - z_off, 0, z_maxbin
        )
        # CRITICAL: pin the quantized symbols. Without the barrier XLA may
        # REMATERIALIZE z_bin (derived from bf16 convs) separately for each
        # consumer below, and the recomputations can round differently —
        # start and freq then disagree about the coded bin and the rANS
        # stream silently desynchronizes (found with trained-EB tables;
        # tools/test_codec_exact_tpu.py).
        z_bin = jax.lax.optimization_barrier(z_bin)

        zb = z_bin.reshape(-1)
        rows_per_sym = self._z_rows_per_sym(z_rows, zb.shape[0] // z.shape[-1])
        # exact masked max-reduce: a one-hot SUM here is pattern-matched
        # by XLA into an MXU dot whose bf16 operands cannot represent CDF
        # boundaries like 65533 -> freq off by a few units -> rANS desync
        # (found with trained-EB tables; see tests/test_interleaved.py)
        Lz = rows_per_sym.shape[-1]
        zcols = jax.lax.broadcasted_iota(jnp.int32, (1, Lz), 1)
        z_start_i = jnp.max(
            jnp.where(zcols == zb[:, None], rows_per_sym, 0), axis=1)
        z_nxt = jnp.max(
            jnp.where(zcols == zb[:, None] + 1, rows_per_sym, 0), axis=1)
        z_start = z_start_i.astype(jnp.uint32)
        z_freq = (z_nxt - z_start_i).astype(jnp.uint32)
        # z is ~10% of the payload; not worth the overflow risk of capping
        ps_z = _encode_pass(zb, z_start, z_freq, self.lanes, 1,
                            self.pallas_encode)

        y_ = ckbd.unembed(y)
        sym = jnp.clip(
            jnp.round(y_).astype(jnp.int32), -self.max_abs, self.max_abs
        )  # [2, b, h, w/2, c]
        sym = jax.lax.optimization_barrier(sym)  # see z_bin barrier above
        y_hat = ckbd.embed(sym.astype(jnp.float32))
        return ps_z, z_bin, sym[0], sym[1], y_hat

    def _side_impl(self, state, z_bin):
        """SHARED enc/dec: dequantize z and run h_s. Same executable on both
        sides -> bit-identical side params by construction."""
        m, ckbd, hyper, gmm_lc = self._modules(state)
        eb = hyper.entropy_bottleneck
        med = eb._get_medians()[:, 0, 0]
        z_off = eb.offset.astype(jnp.int32)
        z_hat = (z_bin + z_off).astype(jnp.float32) + med
        return ckbd.unembed(hyper.h_s(z_hat))

    def _rows0_impl(self, state, side0):
        """SHARED enc/dec: anchor-pass GMM rows (context is zero)."""
        m, ckbd, hyper, gmm_lc = self._modules(state)
        lo, num_bins = self._lo_bins()
        b, h, w2, c2 = side0.shape
        ctx = jnp.zeros_like(side0)
        scales, means, weights = self._gmm_pass_params(ckbd, gmm_lc, ctx, side0)
        return gmm_guarded_rows(scales, means, weights, lo, num_bins, self.mode)

    def _rows1_impl(self, state, side1, sym0):
        """SHARED enc/dec: non-anchor-pass GMM rows conditioned on decoded
        anchors (integer symbols -> deterministic input)."""
        m, ckbd, hyper, gmm_lc = self._modules(state)
        lo, num_bins = self._lo_bins()
        y_hat_ = jnp.stack([sym0.astype(jnp.float32), jnp.zeros_like(sym0, jnp.float32)])
        ctx = ckbd.unembed(ckbd.context_prediction(ckbd.embed(y_hat_)))[1]
        scales, means, weights = self._gmm_pass_params(ckbd, gmm_lc, ctx, side1)
        return gmm_guarded_rows(scales, means, weights, lo, num_bins, self.mode)

    def _encpass_impl(self, rows, sym_flat, cap_divisor):
        """Encoder: select (start, freq) from the shared rows and run the
        interleaved encode scan."""
        lo, num_bins = self._lo_bins()
        jbin = sym_flat - lo
        # exact masked max-reduce, NOT a one-hot sum: XLA lowers integer
        # one-hot dot-products onto the MXU with bf16 operands, which cannot
        # represent CDF boundaries like 65533 (silent rANS desync, found
        # with trained tables); a reduce-max can never become a matmul, and
        # unlike a gather it stays vectorized on TPU.
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
        m, ckbd, hyper, gmm_lc = self._modules(state)
        eb = hyper.entropy_bottleneck
        z_rows, z_off, z_maxbin = self._z_tables(eb)
        b, zh, zw, c_z = zshape
        n_z = b * zh * zw * c_z
        rows_per_sym = self._z_rows_per_sym(z_rows, b * zh * zw)
        z_bin = _decode_pass(ps_z, rows_per_sym, n_z, jnp.int32(0), self.lanes,
                             self.pallas_decode)
        return z_bin.reshape(b, zh, zw, c_z)

    def _embed_impl(self, state, sym0, sym1):
        m, ckbd, hyper, gmm_lc = self._modules(state)
        return ckbd.embed(
            jnp.stack([sym0, sym1]).astype(jnp.float32)
        )

    def _gs_impl(self, state, y_hat):
        m, _, _, _ = self._modules(state)
        return jnp.clip(self._transform(m.g_s, y_hat), 0.0, 1.0)

    # -- orchestration ---------------------------------------------------------

    def encode(self, x, full: bool = False):
        """Returns device-side dict; call ``to_bytes`` for serialization.

        ``full=True`` disables the stream cap (used as the overflow
        fallback for pathological inputs)."""
        cd = 1 if full else self.cap_divisor
        x = self._maybe_shard(x)
        ps_z, z_bin, sym0, sym1, y_hat = self._analyze_jit(self._state, x, cd)
        _prefetch(ps_z)
        z_bin = self._canon(z_bin)
        sym0 = self._canon(sym0)
        sym1 = self._canon(sym1)
        side = self._side_jit(self._state, z_bin)
        rows0 = self._rows0_jit(self._state, side[0])
        ps0 = _prefetch(self._encpass_jit(rows0, sym0.reshape(-1), cd))
        rows1 = self._rows1_jit(self._state, side[1], sym0)
        ps1 = _prefetch(self._encpass_jit(rows1, sym1.reshape(-1), cd))
        return {"z": ps_z, "y0": ps0, "y1": ps1, "y_hat": y_hat}

    def _y_shape_parts(self, y_shape):
        if len(y_shape) == 4:
            b, h, w, c = y_shape
        else:
            h, w, c = y_shape
            b = 1
        return b, h, w, c

    def _decode_y(self, streams, y_shape):
        ps_z, ps0, ps1 = streams["z"], streams["y0"], streams["y1"]
        b, h, w, c = self._y_shape_parts(y_shape)
        z_bin = self._canon(self._zdec_jit(
            self._state, ps_z, (b, h // 4, w // 4, self._z_channels())
        ))
        side = self._side_jit(self._state, z_bin)
        rows0 = self._rows0_jit(self._state, side[0])
        sym0 = self._canon(
            self._decpass_jit(rows0, ps0).reshape(b, h, w // 2, c))
        rows1 = self._rows1_jit(self._state, side[1], sym0)
        sym1 = self._decpass_jit(rows1, ps1).reshape(b, h, w // 2, c)
        y_hat = self._embed_jit(self._state, sym0, sym1)
        if len(y_shape) == 3:
            pass  # batch dim of 1 is kept (matches encoder output)
        return y_hat

    def decode(self, out_or_streams, y_shape):
        y_hat = self._maybe_shard(self._decode_y(out_or_streams, y_shape))
        return self._gs_jit(self._state, y_hat)

    def decode_y_hat(self, out_or_streams, y_shape):
        return self._decode_y(out_or_streams, y_shape)

    def stream_capacities(self, y_shape):
        """(cap_z, cap_y) capped stream lengths for latent y_shape =
        (h, w, c) or (b, h, w, c)."""
        b, h, w, c = self._y_shape_parts(y_shape)
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
        single uint32 buffer, unpacked on device."""
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
        streams = self._unpack_jit(packed, tuple(y_shape))
        y_hat = self._decode_y(
            dict(zip(("z", "y0", "y1"), streams)), y_shape
        )
        return self._gs_jit(self._state, y_hat)

    @functools.cached_property
    def _unpack_jit(self):
        def impl(packed, y_shape):
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
            return tuple(passes)

        return jax.jit(impl, static_argnums=(1,))

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


class FastCheckerboardGsmCodec(FastCheckerboardGmmCodec):
    """Single-jit on-device codec for Cheng2020AnchorCheckerboard (the
    single-Gaussian / GSM counterpart; reference models/sensetime.py:69-172
    and the table-free GSM coder rans_interface.cpp:401-456, 690-764).

    Same correctness-by-construction structure as the GMM codec, coded as
    a K=1 mixture so the ``_mixture_cdf`` add chain stays structurally
    identical between the encoder's and decoder's compiled programs.  The
    one structural difference from GMM: the GC latent codec quantizes
    mean-centered (``quantize_ste(y - means) + means``), so symbols are
    ``round(y - mu)``, the CDF rows are zero-mean, and the shared rows
    programs also return ``mu`` (both sides then reconstruct
    ``y_hat = sym + mu`` bit-identically).
    """

    def _modules(self, state):
        m = nnx.merge(self._graphdef, state)
        ckbd = m.latent_codec["y"]
        hyper = m.latent_codec["hyper"]
        gc_lc = ckbd.latent_codec["y"]  # GaussianConditionalLatentCodec
        return m, ckbd, hyper, gc_lc

    def _gsm_pass_params(self, ckbd, gc_lc, y_ctx, side):
        """EP -> (scales [N,1] clamped, means [b,h,w/2,c])."""
        p = ckbd.entropy_parameters(ckbd.merge(y_ctx, side))
        scales, means = gc_lc._chunk(p)
        flat = scales.reshape(-1, 1)
        return jnp.clip(flat, 0.11, 256.0), means

    def _analyze_impl(self, state, x, cap_divisor):
        """Encoder-only: transforms + the z table pass. Unlike the GMM
        flagship, y cannot be quantized here (symbols are mean-centered and
        the means depend on the side/context params)."""
        m, ckbd, hyper, gc_lc = self._modules(state)
        eb = hyper.entropy_bottleneck

        y = self._transform(m.g_a, x)
        z = self._transform(hyper.h_a, y)

        med = eb._get_medians()[:, 0, 0]
        z_rows, z_off, z_maxbin = self._z_tables(eb)
        z_bin = jnp.clip(
            jnp.round(z - med).astype(jnp.int32) - z_off, 0, z_maxbin
        )
        # CRITICAL: pin the quantized symbols. Without the barrier XLA may
        # REMATERIALIZE z_bin (derived from bf16 convs) separately for each
        # consumer below, and the recomputations can round differently —
        # start and freq then disagree about the coded bin and the rANS
        # stream silently desynchronizes (found with trained-EB tables;
        # tools/test_codec_exact_tpu.py).
        z_bin = jax.lax.optimization_barrier(z_bin)

        zb = z_bin.reshape(-1)
        rows_per_sym = self._z_rows_per_sym(z_rows, zb.shape[0] // z.shape[-1])
        # exact masked max-reduce: a one-hot SUM here is pattern-matched
        # by XLA into an MXU dot whose bf16 operands cannot represent CDF
        # boundaries like 65533 -> freq off by a few units -> rANS desync
        # (found with trained-EB tables; see tests/test_interleaved.py)
        Lz = rows_per_sym.shape[-1]
        zcols = jax.lax.broadcasted_iota(jnp.int32, (1, Lz), 1)
        z_start_i = jnp.max(
            jnp.where(zcols == zb[:, None], rows_per_sym, 0), axis=1)
        z_nxt = jnp.max(
            jnp.where(zcols == zb[:, None] + 1, rows_per_sym, 0), axis=1)
        z_start = z_start_i.astype(jnp.uint32)
        z_freq = (z_nxt - z_start_i).astype(jnp.uint32)
        ps_z = _encode_pass(zb, z_start, z_freq, self.lanes, 1,
                            self.pallas_encode)

        y_ = ckbd.unembed(y)  # [2, b, h, w/2, c] float
        return ps_z, z_bin, y_[0], y_[1]

    def _rows0_impl(self, state, side0):
        """SHARED enc/dec: anchor-pass zero-mean GSM rows + anchor means."""
        m, ckbd, hyper, gc_lc = self._modules(state)
        lo, num_bins = self._lo_bins()
        ctx = jnp.zeros_like(side0)
        scales, mu = self._gsm_pass_params(ckbd, gc_lc, ctx, side0)
        rows = gmm_guarded_rows(
            scales, jnp.zeros_like(scales), jnp.ones_like(scales),
            lo, num_bins, self.mode,
        )
        return rows, mu

    def _rows1_impl(self, state, side1, sym0, mu0):
        """SHARED enc/dec: non-anchor rows + means, conditioned on the
        reconstructed anchors (sym0 + mu0, bit-identical on both sides)."""
        m, ckbd, hyper, gc_lc = self._modules(state)
        lo, num_bins = self._lo_bins()
        y_hat0 = sym0.astype(jnp.float32) + mu0
        y_hat_ = jnp.stack([y_hat0, jnp.zeros_like(y_hat0)])
        ctx = ckbd.unembed(ckbd.context_prediction(ckbd.embed(y_hat_)))[1]
        scales, mu = self._gsm_pass_params(ckbd, gc_lc, ctx, side1)
        rows = gmm_guarded_rows(
            scales, jnp.zeros_like(scales), jnp.ones_like(scales),
            lo, num_bins, self.mode,
        )
        return rows, mu

    def _quantize_jit_impl(self, y_half, mu):
        return jnp.clip(
            jnp.round(y_half - mu).astype(jnp.int32),
            -self.max_abs, self.max_abs,
        )

    def _embed_impl(self, state, sym0, sym1, mu0, mu1):
        m, ckbd, hyper, gc_lc = self._modules(state)
        return ckbd.embed(
            jnp.stack([
                sym0.astype(jnp.float32) + mu0,
                sym1.astype(jnp.float32) + mu1,
            ])
        )

    @functools.cached_property
    def _quantize_jit(self):
        return jax.jit(self._quantize_jit_impl)

    def encode(self, x, full: bool = False):
        cd = 1 if full else self.cap_divisor
        x = self._maybe_shard(x)
        ps_z, z_bin, y0, y1 = self._analyze_jit(self._state, x, cd)
        _prefetch(ps_z)
        z_bin = self._maybe_shard(z_bin)
        side = self._side_jit(self._state, z_bin)
        rows0, mu0 = self._rows0_jit(self._state, side[0])
        sym0 = self._maybe_shard(self._quantize_jit(y0, mu0))
        ps0 = _prefetch(self._encpass_jit(rows0, sym0.reshape(-1), cd))
        rows1, mu1 = self._rows1_jit(self._state, side[1], sym0, mu0)
        sym1 = self._quantize_jit(y1, mu1)
        ps1 = _prefetch(self._encpass_jit(rows1, sym1.reshape(-1), cd))
        y_hat = self._embed_jit(self._state, sym0, sym1, mu0, mu1)
        return {"z": ps_z, "y0": ps0, "y1": ps1, "y_hat": y_hat}

    def _decode_y(self, streams, y_shape):
        ps_z, ps0, ps1 = streams["z"], streams["y0"], streams["y1"]
        b, h, w, c = self._y_shape_parts(y_shape)
        z_bin = self._maybe_shard(self._zdec_jit(
            self._state, ps_z, (b, h // 4, w // 4, self._z_channels())
        ))
        side = self._side_jit(self._state, z_bin)
        rows0, mu0 = self._rows0_jit(self._state, side[0])
        sym0 = self._maybe_shard(
            self._decpass_jit(rows0, ps0).reshape(b, h, w // 2, c))
        rows1, mu1 = self._rows1_jit(self._state, side[1], sym0, mu0)
        sym1 = self._decpass_jit(rows1, ps1).reshape(b, h, w // 2, c)
        return self._embed_jit(self._state, sym0, sym1, mu0, mu1)
