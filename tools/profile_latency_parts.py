"""Where do the ~40 ms/direction of single-image latency go?

Times each stage of the FastLatencyGmmCodec encode/decode programs as a
separately-jitted piece on the TPU (fusion differences mean the sum can
differ from the fused program's wall, but it locates the dominant cost).

Usage (TPU): python tools/profile_latency_parts.py [--lanes 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
from flax import nnx

p = argparse.ArgumentParser()
p.add_argument("--lanes", type=int, default=1024)
args = p.parse_args()

from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastLatencyGmmCodec
from flashgmm_tpu.runtime.fast_codec import apply_transform, _encode_pass, _decode_pass
from flashgmm_tpu.datasets.synthetic import textured_leaves
import bench as B

model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
B._load_bench_weights(model)
model.update(update_quantiles=True)
lc = FastLatencyGmmCodec(model, lanes=args.lanes, cap_divisor=4)
x = jax.device_put(jnp.asarray(textured_leaves(768, 512, seed=500001))[None])


def timeit(name, fn, *a, reps=6):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/reps*1e3:8.2f} ms", flush=True)
    return out


state = lc._state

g_a = jax.jit(lambda s, x: apply_transform(
    nnx.merge(lc._graphdef, s).g_a, x, lc.bf16_transforms))
y = timeit("g_a", g_a, state, x)

h_a = jax.jit(lambda s, y: apply_transform(
    nnx.merge(lc._graphdef, s).latent_codec["hyper"].h_a, y,
    lc.bf16_transforms))
z = timeit("h_a", h_a, state, y)

h_s = jax.jit(lambda s, z: nnx.merge(lc._graphdef, s).latent_codec[
    "hyper"].h_s(jnp.round(z)))
zh = timeit("h_s", h_s, state, z)


def side_fn(s, z):
    m, ckbd, hyper, _ = lc._modules(s)
    return ckbd.unembed(hyper.h_s(jnp.round(z)))


side = timeit("h_s+unembed", jax.jit(side_fn), state, z)


def rows0_fn(s, side0):
    _, ckbd, _, gmm_lc = lc._modules(s)
    return lc._rows0(ckbd, gmm_lc, side0)


rows0 = timeit("rows0 (ep+gmm_rows)", jax.jit(rows0_fn), state, side[0])


def rows1_fn(s, side1, sym0):
    _, ckbd, _, gmm_lc = lc._modules(s)
    return lc._rows1(ckbd, gmm_lc, side1, sym0)


sym0 = jnp.zeros((1, y.shape[1], y.shape[2] // 2, y.shape[3]), jnp.int32)
rows1 = timeit("rows1 (ctx+ep+gmm_rows)", jax.jit(rows1_fn), state,
               side[1], sym0)


def lookup_enc(s, rows, sym):
    st, f = lc._lookup(rows, sym.reshape(-1) - lc._lo_bins()[0])
    return _encode_pass(sym.reshape(-1), st.astype(jnp.uint32), f,
                        lc.lanes, lc.cap_divisor)


ps0 = timeit("lookup+encode_pass y0", jax.jit(lookup_enc), state, rows0,
             sym0)

dec_pass = jax.jit(lambda ps, rows: _decode_pass(
    ps, rows, rows.shape[0], lc._lo_bins()[0], lc.lanes))
timeit("decode_pass y0", dec_pass, ps0, rows0)


def g_s_fn(s, y_hat):
    m, _, _, _ = lc._modules(s)
    return jnp.clip(apply_transform(m.g_s, y_hat, lc.bf16_transforms), 0, 1)


timeit("g_s", jax.jit(g_s_fn), state, jnp.round(y))

# the fused ends for comparison
enc = lc._encode_jit(state, x, lc.cap_divisor)
jax.block_until_ready(enc)
t0 = time.time()
for _ in range(4):
    enc = lc._encode_jit(state, x, lc.cap_divisor)
jax.block_until_ready(enc)
print(f"{'FUSED encode program':28s} {(time.time()-t0)/4*1e3:8.2f} ms")

ps_z, ps0, ps1, s0, s1, y_hat = enc
y_shape = (x.shape[0], s0.shape[1], s0.shape[2] * 2, s0.shape[3])
out = lc._decode_y_jit(state, (ps_z, ps0, ps1), y_shape)
jax.block_until_ready(out)
t0 = time.time()
for _ in range(4):
    out = lc._decode_y_jit(state, (ps_z, ps0, ps1), y_shape)
jax.block_until_ready(out)
print(f"{'decode-y program':28s} {(time.time()-t0)/4*1e3:8.2f} ms")
