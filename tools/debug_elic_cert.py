"""Localize the fused-ELIC certification failure (latency_elic.py).

Compares, on the real chip:
  (a) fused-encoder streams vs composable-codec streams, byte-for-byte
      per stream (z + 5 groups x 2 passes) — is the fused ENCODER's CDF
      math identical to the proven composable executables?
  (b) composable streams -> fused decoder y_hat vs composable y_hat,
      mismatch counts per channel group / checkerboard parity — where
      does the fused DECODER first diverge?

All programs were compiled by tools/bench_elic.py immediately before, so
this runs from the compile cache in a couple of minutes.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.datasets.synthetic import textured_leaves
from flashgmm_tpu.models.elic_gmm import Elic2022GMM
from flashgmm_tpu.runtime import FastElicGmmCodec
from flashgmm_tpu.runtime.latency_elic import FastLatencyElicCodec
from flashgmm_tpu.zoo import load_npz_weights

H, W = 768, 512
model = Elic2022GMM(N=192, M=320, K=4, rngs=nnx.Rngs(0))
root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
trained = load_npz_weights(
    model, os.path.join(root, "weights/elic_gmm_n192_m320_k4_synthetic.npz")) > 0
print("trained:", trained, flush=True)
model.update(update_quantiles=True)

lat = FastLatencyElicCodec(model, lanes=512)
comp = FastElicGmmCodec(model, lanes=512, max_abs=lat.max_abs,
                        cap_divisor=lat.cap_divisor,
                        bf16_transforms=lat.bf16_transforms)

img = jax.device_put(jnp.asarray(textured_leaves(H, W, seed=500001))[None])

# composable encode (correct-by-construction shared executables)
out = comp.encode(img, full=False)
streams_c, y_hat_c = out["streams"], np.asarray(out["y_hat"])
y_shape = tuple(out["y_hat"].shape)

# (a) fused encoder vs composable streams
streams_f, y_hat_f = lat._enc_full_jit(lat._state, img, lat.cap_divisor)
print("y_hat enc fused==comp:", bool((np.asarray(y_hat_f) == y_hat_c).all()),
      flush=True)
names = ["z"] + [f"g{k}p{i}" for k in range(5) for i in (0, 1)]
for i, (pc, pf) in enumerate(zip(streams_c, streams_f)):
    nc, nf = int(np.asarray(pc.n_words)), int(np.asarray(pf.n_words))
    sc = np.asarray(pc.stream)[:nc]
    sf = np.asarray(pf.stream)[:nf]
    same_states = bool(
        (np.asarray(pc.states) == np.asarray(pf.states)).all())
    same = nc == nf and sc.shape == sf.shape and bool((sc == sf).all())
    print(f"stream {names[i]:5s}: n {nc:6d} vs {nf:6d} "
          f"bytes_equal={same} states_equal={same_states}", flush=True)

# (b) composable streams through the fused decoder
x_dec, y_dec = lat._dec_full_jit(lat._state, tuple(streams_c), y_shape)
y_dec = np.asarray(y_dec)
print("full y_hat dec==enc:", bool((y_dec == y_hat_c).all()), flush=True)
groups = comp.groups
c0 = 0
for k, gk in enumerate(groups):
    sl = y_dec[..., c0:c0 + gk]
    ref = y_hat_c[..., c0:c0 + gk]
    mism = int((sl != ref).sum())
    print(f"group {k} (c{c0}:{c0+gk}): mismatches {mism}"
          + ("" if mism == 0 else
             f" first at {np.argwhere(sl != ref)[0].tolist()}"), flush=True)
    c0 += gk
