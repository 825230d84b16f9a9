"""TRUE on-device single-image codec latency (tunnel-RTT-free).

This environment's axon tunnel costs ~27 ms per blocking host fetch
(measured: a trivial jitted x+1 with a scalar fetch takes 27.3 ms, and a
137-GFLOP matmul takes the same — execution hides entirely under the
round trip; `block_until_ready` is an ack, not a completion wait). Wall
timings of single-image encode/decode therefore have a ~27 ms floor that
NO codec can beat here, and that a real deployment (local PCIe runtime,
sub-0.1 ms dispatch) never pays.

See flashgmm_tpu/runtime/latency_probe.py for the measurement method
(K-iteration fori_loop, slope between two K values).

Usage (TPU): python tools/measure_device_latency.py [--lanes 1024]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
from flax import nnx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=1024)
    p.add_argument("--k1", type=int, default=2)
    p.add_argument("--k2", type=int, default=10)
    args = p.parse_args()

    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime import FastLatencyGmmCodec
    from flashgmm_tpu.runtime.latency_probe import measure_device_latency
    from flashgmm_tpu.datasets.synthetic import textured_leaves
    import bench as B

    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    B._load_bench_weights(model)
    model.update(update_quantiles=True)
    lc = FastLatencyGmmCodec(model, lanes=args.lanes, cap_divisor=4)
    x = jax.device_put(
        jnp.asarray(textured_leaves(768, 512, seed=500001))[None])

    # one real round trip to get decode-layout streams
    data, y_shape = lc.encode_certified(x)
    streams = lc.from_bytes(data, y_shape)

    enc_ms, dec_ms = measure_device_latency(
        lc, x, streams, y_shape, k1=args.k1, k2=args.k2)
    print(f"RESULT lanes={args.lanes}: enc {enc_ms:.2f} ms + "
          f"dec {dec_ms:.2f} ms on-device single-image", flush=True)


if __name__ == "__main__":
    main()
