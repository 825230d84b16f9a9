"""Chip-side 2K enc/dec latency via the fori-loop K-slope probe
(VERDICT r4 item 6: settle the 59-vs-88 ms 2K question with device
numbers, not tunnel wall time).

Runs the flagship latency codec's fused encode/decode programs at
2048x1088 batch-N inside one fori_loop and reports the per-image slope;
updates results/synthetic/highres_throughput.json with a
"device_slope" section.

Usage (TPU, quiet chip): python tools/bench_2k_slope.py [--batch 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from flax import nnx

p = argparse.ArgumentParser()
p.add_argument("--height", type=int, default=2048)
p.add_argument("--width", type=int, default=1088)
p.add_argument("--batch", type=int, default=4)
p.add_argument("--lanes", type=int, default=4096)
p.add_argument("--out", default="results/synthetic/highres_throughput.json")
args = p.parse_args()

from flashgmm_tpu.datasets.synthetic import textured_leaves
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastLatencyGmmCodec
from flashgmm_tpu.runtime.latency_probe import measure_device_latency
import bench as B

H, W, BATCH = args.height, args.width, args.batch
model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
B._load_bench_weights(model)
model.update(update_quantiles=True)
lc = FastLatencyGmmCodec(model, lanes=args.lanes, cap_divisor=4)

print(f"generating batch of {BATCH} {H}x{W}...", flush=True)
x = jnp.stack([jnp.asarray(textured_leaves(H, W, seed=710000 + i))
               for i in range(BATCH)])

print("warm-up encode (compile)...", flush=True)
data, y_shape = lc.encode_certified(x)
streams = lc.from_bytes(data, y_shape)
print(f"encoded {len(data)} bytes "
      f"({len(data) * 8 / (BATCH * H * W):.3f} bpp)", flush=True)

enc_ms, dec_ms = measure_device_latency(lc, x, streams, tuple(y_shape))
enc_img, dec_img = enc_ms / BATCH, dec_ms / BATCH
mpx = BATCH * H * W / 1e6
print(f"device slope: enc {enc_ms:.1f} ms/batch ({enc_img:.1f} ms/img, "
      f"{mpx / enc_ms * 1e3:.1f} Mpx/s) | dec {dec_ms:.1f} ms/batch "
      f"({dec_img:.1f} ms/img, {mpx / dec_ms * 1e3:.1f} Mpx/s)", flush=True)

out_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), args.out)
doc = {}
if os.path.exists(out_path):
    with open(out_path) as f:
        doc = json.load(f)
doc["device_slope"] = {
    "height": H, "width": W, "batch": BATCH, "lanes": args.lanes,
    "encode_ms_per_img": enc_img, "decode_ms_per_img": dec_img,
    "encode_mpx_per_s": mpx / enc_ms * 1e3,
    "decode_mpx_per_s": mpx / dec_ms * 1e3,
    "method": "fori-loop K-slope on the fused latency programs "
              "(tunnel-RTT-free); conclusion: these are the chip-side "
              "numbers — wall-time differences beyond them are tunnel "
              "variance",
}
with open(out_path, "w") as f:
    json.dump(doc, f, indent=2)
    f.write("\n")
print("wrote", args.out)
