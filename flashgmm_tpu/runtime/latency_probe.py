"""True on-device codec latency measurement (tunnel-RTT-free).

The axon test environment costs ~27 ms per blocking host fetch, and its
``block_until_ready`` acks dispatch without waiting for execution, so
naive wall timings of a single-image encode/decode measure the tunnel,
not the codec. This probe runs K iterations of the full encode (or
decode) program inside ONE jitted ``lax.fori_loop`` — one dispatch, one
scalar fetch (which genuinely forces completion: the value cannot exist
before the loop ran) — and reports the K2/K1 slope, which cancels the
round trip and dispatch cost exactly. Each iteration is data-dependent
on the previous one through a ``where`` keyed on a runtime zero, so XLA
cannot collapse the loop; the selected values are bit-identical every
iteration, so iteration i codes exactly the same image as iteration 0.

On real deployment hardware (local runtime, sub-0.1 ms dispatch) the
wall latency IS this device latency; the reference's published numbers
(BASELINE.md) were likewise measured without a network between host and
accelerator.
"""

import time

import jax
import jax.numpy as jnp


def measure_fn_latency(fn, x, k1=2, k2=10, reps=4):
    """True device latency (ms) of ``fn(x)`` for a float-array->array fn.

    Same K-slope method as measure_device_latency: K dependent iterations
    in one fori_loop, one scalar fetch, slope between two K values.
    """

    @jax.jit
    def run(x0, zero, k):
        def body(i, carry):
            xi, acc = carry
            out = fn(xi)
            tag = jnp.sum(
                jax.tree.leaves(out)[0].ravel()[:4].astype(jnp.float32))
            xi = jnp.where(tag + zero == tag, x0, 0.0)
            return xi, acc + tag

        # k is a runtime value -> ONE compile serves every K (the loop
        # lowers to while_loop; per-iteration cost is what we measure)
        _, acc = jax.lax.fori_loop(0, k, body, (x0, jnp.float32(0)))
        return acc

    zero = jnp.float32(0)

    def timed(k):
        _ = float(run(x, zero, jnp.int32(k)))
        t0 = time.time()
        for _ in range(reps):
            _ = float(run(x, zero, jnp.int32(k)))
        return (time.time() - t0) / reps * 1e3

    t1 = timed(k1)
    t2 = timed(k2)
    return (t2 - t1) / (k2 - k1)


def measure_device_latency(lc, x, streams, y_shape, k1=2, k2=10, reps=4):
    """(encode_ms, decode_ms) per image for a FastLatencyGmmCodec.

    Args:
        lc: FastLatencyGmmCodec (already constructed; weights loaded).
        x: device-resident [1, H, W, 3] image.
        streams: decode-layout PassStream tuple (from ``lc.from_bytes``).
        y_shape: 4-tuple y latent shape.
    """

    from .fast_codec import conv_backend_ctx

    @jax.jit
    def enc_run(state, x0, zero, k):
        def body(i, carry):
            xi, acc = carry
            with conv_backend_ctx(lc):  # same conv backend as production
                ps_z, ps0, ps1, s0, s1, y_hat = lc._encode_impl(
                    state, xi, lc.cap_divisor)
            tag = (ps_z.n_words + ps0.n_words + ps1.n_words
                   + ps_z.stream[0].astype(jnp.int32)
                   + ps0.stream[0].astype(jnp.int32)
                   + ps1.stream[0].astype(jnp.int32)
                   + jnp.sum(s0[0, 0, :8])).astype(jnp.int32)
            xi = jnp.where(tag + zero == tag, x0, 0.0)
            return xi, acc + tag

        _, acc = jax.lax.fori_loop(0, k, body, (x0, jnp.int32(0)))
        return acc

    @jax.jit
    def dec_run(state, streams, zero, k):
        def body(i, carry):
            st, acc = carry
            with conv_backend_ctx(lc):
                sym0, sym1, y_hat = lc._decode_y_impl(state, st, y_shape)
                x_hat = lc._gs_impl(state, y_hat)
            tag = (jnp.sum(sym0[0, 0, :8]) +
                   (x_hat[0, 0, 0, 0] > 2.0).astype(jnp.int32))
            z0 = st[0]
            z0 = z0._replace(
                states=jnp.where(tag + zero == tag, z0.states,
                                 jnp.uint32(0)))
            return (z0,) + tuple(st[1:]), acc + tag

        _, acc = jax.lax.fori_loop(0, k, body, (streams, jnp.int32(0)))
        return acc

    zero = jnp.int32(0)
    streams = jax.device_put(streams)

    def timed(fn, k, *a):
        _ = int(fn(*a, zero, jnp.int32(k)))  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            _ = int(fn(*a, zero, jnp.int32(k)))
        return (time.time() - t0) / reps * 1e3

    e1 = timed(enc_run, k1, lc._state, x)
    e2 = timed(enc_run, k2, lc._state, x)
    d1 = timed(dec_run, k1, lc._state, streams)
    d2 = timed(dec_run, k2, lc._state, streams)
    return (e2 - e1) / (k2 - k1), (d2 - d1) / (k2 - k1)


def measure_elic_device_latency(lc, x, streams, y_shape, k1=2, k2=8, reps=4):
    """(encode_ms, decode_ms) per image for a FastLatencyElicCodec.

    Same K-slope method as measure_device_latency, over the fused
    single-program SCCTX encode/decode (latency_elic.py).
    """
    y_shape = tuple(int(s) for s in y_shape)

    from .fast_codec import conv_backend_ctx

    @jax.jit
    def enc_run(state, x0, zero, k):
        def body(i, carry):
            xi, acc = carry
            with conv_backend_ctx(lc):  # same conv backend as production
                strs, y_hat = lc._encode_full_impl(state, xi,
                                                   lc.cap_divisor)
            tag = jnp.sum(y_hat[0, 0, 0, :8]).astype(jnp.int32)
            for p in strs:
                tag = tag + p.n_words + p.stream[0].astype(jnp.int32)
            xi = jnp.where(tag + zero == tag, x0, 0.0)
            return xi, acc + tag

        _, acc = jax.lax.fori_loop(0, k, body, (x0, jnp.int32(0)))
        return acc

    @jax.jit
    def dec_run(state, strs, zero, k):
        def body(i, carry):
            st, acc = carry
            with conv_backend_ctx(lc):
                x_hat, y_hat = lc._decode_full_impl(state, st, y_shape)
            tag = (jnp.sum(y_hat[0, 0, 0, :8]).astype(jnp.int32)
                   + (x_hat[0, 0, 0, 0] > 2.0).astype(jnp.int32))
            z0 = st[0]
            z0 = z0._replace(
                states=jnp.where(tag + zero == tag, z0.states, jnp.uint32(0))
            )
            return (z0,) + tuple(st[1:]), acc + tag

        _, acc = jax.lax.fori_loop(0, k, body, (strs, jnp.int32(0)))
        return acc

    zero = jnp.int32(0)
    streams = jax.device_put(tuple(streams))

    def timed(fn, k, *a):
        _ = int(fn(*a, zero, jnp.int32(k)))
        t0 = time.time()
        for _ in range(reps):
            _ = int(fn(*a, zero, jnp.int32(k)))
        return (time.time() - t0) / reps * 1e3

    e1 = timed(enc_run, k1, lc._state, x)
    e2 = timed(enc_run, k2, lc._state, x)
    d1 = timed(dec_run, k1, lc._state, streams)
    d2 = timed(dec_run, k2, lc._state, streams)
    return (e2 - e1) / (k2 - k1), (d2 - d1) / (k2 - k1)
