"""Drill into the fused-ELIC decoder divergence (group 3 pass 0).

Runs a debug variant of _decode_full_impl that also returns the
barriered stage interfaces (side_all, params_3, rows0_3), and compares
each against the proven composable stage executables. Tells us WHICH
stage's math compiles differently inside the fused decoder program.
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
load_npz_weights(
    model, os.path.join(root, "weights/elic_gmm_n192_m320_k4_synthetic.npz"))
model.update(update_quantiles=True)

lat = FastLatencyElicCodec(model, lanes=512)
comp = FastElicGmmCodec(model, lanes=512, max_abs=lat.max_abs,
                        cap_divisor=lat.cap_divisor,
                        bf16_transforms=lat.bf16_transforms)

img = jax.device_put(jnp.asarray(textured_leaves(H, W, seed=500001))[None])
out = comp.encode(img)
streams_c = out["streams"]
y_shape = tuple(out["y_hat"].shape)


def dbg_impl(state, streams, y_shape):
    self = lat
    b, h, w, c = y_shape
    z_bin = self._zdec_impl(
        state, streams[0], (b, h // 4, w // 4, self._n_z_channels)
    )
    side_all = jax.lax.optimization_barrier(self._side_impl(state, z_bin))
    syms = []
    si = 1
    keep = {}
    for k in range(len(self.groups)):
        gk = self.groups[k]
        params_k = jax.lax.optimization_barrier(
            self._ctxparams_impl(state, side_all, tuple(syms), k)
        )
        rows0 = jax.lax.optimization_barrier(self._rows_impl(
            state, params_k, jnp.zeros((b, h, w // 2, gk), jnp.int32), k, 0
        ))
        sym0 = self._decpass_impl(rows0, streams[si]).reshape(b, h, w // 2, gk)
        si += 1
        rows1 = jax.lax.optimization_barrier(
            self._rows_impl(state, params_k, sym0, k, 1)
        )
        sym1 = self._decpass_impl(rows1, streams[si]).reshape(b, h, w // 2, gk)
        si += 1
        syms += [sym0, sym1]
        if k == 3:
            keep = {"params": params_k, "rows0": rows0, "z_bin": z_bin,
                    "side": side_all, "sym0": sym0}
    return keep


dbg_jit = jax.jit(dbg_impl, static_argnums=(2,))
keep = dbg_jit(lat._state, tuple(streams_c), y_shape)

# composable references, from the stage executables shared with the
# byte-proven encode path
b, h, w, c = y_shape
z_bin_c = comp._zdec_jit(comp._state, streams_c[0],
                         (b, h // 4, w // 4, comp._z_channels()))
side_c = comp._side_jit(comp._state, z_bin_c)
# true syms for groups 0..2 from the encoder output
y_hat_c = out["y_hat"]


def unembed_syms(k):
    cg = comp._modules(comp._state)[1]
    ckbd = cg.latent_codec[f"y{k}"]
    c0 = sum(comp.groups[:k])
    yk = y_hat_c[..., c0:c0 + comp.groups[k]]
    s = ckbd.unembed(yk).astype(jnp.int32)
    return s[0], s[1]


prev = []
for j in range(3):
    s0, s1 = unembed_syms(j)
    prev += [s0, s1]
params3_c = comp._ctxparams_jit(comp._state, side_c, tuple(prev), 3)
rows03_c = comp._rows_jit(
    comp._state, params3_c,
    jnp.zeros((b, h, w // 2, comp.groups[3]), jnp.int32), 3, 0)


def cmp(name, a, bb):
    a = np.asarray(a)
    bb = np.asarray(bb)
    if a.dtype.kind == "f":
        eq = int((a != bb).sum())
        mx = float(np.abs(a.astype(np.float64) - bb.astype(np.float64)).max())
        print(f"{name}: mismatches {eq}/{a.size} maxabs {mx:.3e}", flush=True)
    else:
        eq = int((a != bb).sum())
        print(f"{name}: mismatches {eq}/{a.size}", flush=True)


cmp("z_bin ", keep["z_bin"], z_bin_c)
cmp("side  ", keep["side"], side_c)
cmp("params3", keep["params"], params3_c)
cmp("rows0_3", keep["rows0"], rows03_c)
s0c, _ = unembed_syms(3)
cmp("sym0_3", keep["sym0"], s0c)

rf = np.asarray(keep["rows0"]).astype(np.int64)
rc = np.asarray(rows03_c).astype(np.int64)
d = rf - rc
nz = d[d != 0]
print("diff stats: n", nz.size, "min", nz.min() if nz.size else 0,
      "max", nz.max() if nz.size else 0,
      "mean|d|", float(np.abs(nz).mean()) if nz.size else 0, flush=True)
vals, counts = np.unique(np.abs(nz), return_counts=True)
print("abs-diff histogram (top 10):",
      sorted(zip(counts, vals.tolist()), reverse=True)[:10], flush=True)
badrows = (d != 0).any(axis=1)
print("rows touched:", int(badrows.sum()), "/", d.shape[0], flush=True)
cols = (d != 0).sum(axis=0)
print("cols touched (first/last/argmax):", int(cols[0]), int(cols[-1]),
      int(cols.argmax()), int(cols.max()), flush=True)
