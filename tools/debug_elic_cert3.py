"""Experiment: does the fused-ELIC decoder certify when the Pallas decode
kernel is swapped for the scan decoder (pallas_decode=False)?

If yes: the Pallas custom call's forced operand layout propagates through
the optimization_barrier into the rows-producing conv and changes its MXU
accumulation — and the fix is layout isolation before the kernel.
If no: the conv lowering differs for another program-context reason.
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
lat.pallas_decode = False  # before first trace: scan decoder everywhere
comp = FastElicGmmCodec(model, lanes=512, max_abs=lat.max_abs,
                        cap_divisor=lat.cap_divisor,
                        bf16_transforms=lat.bf16_transforms,
                        pallas_decode=False)

img = jax.device_put(jnp.asarray(textured_leaves(H, W, seed=500001))[None])
out = comp.encode(img)
streams_c, y_hat_c = out["streams"], np.asarray(out["y_hat"])
y_shape = tuple(out["y_hat"].shape)

streams_f, y_hat_f = lat._enc_full_jit(lat._state, img, lat.cap_divisor)
enc_same = all(
    int(np.asarray(pc.n_words)) == int(np.asarray(pf.n_words))
    and bool((np.asarray(pc.stream)[: int(np.asarray(pc.n_words))]
              == np.asarray(pf.stream)[: int(np.asarray(pf.n_words))]).all())
    for pc, pf in zip(streams_c, streams_f)
)
print("scan-mode fused enc == composable:", enc_same, flush=True)

x_dec, y_dec = lat._dec_full_jit(lat._state, tuple(streams_c), y_shape)
y_dec = np.asarray(y_dec)
print("scan-mode fused dec == enc:", bool((y_dec == y_hat_c).all()), flush=True)
c0 = 0
for k, gk in enumerate(comp.groups):
    mism = int((y_dec[..., c0:c0 + gk] != y_hat_c[..., c0:c0 + gk]).sum())
    print(f"group {k}: mismatches {mism}", flush=True)
    c0 += gk
