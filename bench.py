"""Benchmark: Kodak-size encode+decode on the flagship ckbd-GMM model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

Baseline (reference FlashGMM on RTX 8000 + AVX2, BASELINE.md): total
compress ~55 ms + decompress ~42 ms = 97 ms per 768x512 Kodak image.
``vs_baseline`` is the speedup factor (baseline_ms / ours_ms; >1 = faster).

The whole codec runs on-device (one XLA program per direction; see
flashgmm_tpu/runtime/fast_codec.py). The headline number is per-image
steady-state over a batched stream of images (batching amortizes this
setup's high fixed host<->device tunnel latency); single-image latency is
reported in the metric string.

Content: HELD-OUT dead-leaves images (natural-image statistics — 1/f-ish
spectrum, occlusion edges; slightly HARDER than a real photo by JPEG-bpp
calibration, see flashgmm_tpu/datasets/synthetic.py), encoded with weights
trained on the same family (different seeds), so streams code at a
realistic photographic rate (~0.6-0.9 bpp) rather than the low-entropy
~0.25 bpp of round 1's smoothed noise.
"""

import json
import sys
import time

import numpy as np


def _load_bench_weights(model):
    """Load briefly-trained weights (realistic symbol statistics) if
    present; the codec timing path is identical either way."""
    import os

    from flashgmm_tpu.zoo import load_npz_weights

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "weights/ckbd_gmm_n192_k4_synthetic.npz",
    )
    return load_npz_weights(model, path) > 0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # The axon tunnel occasionally drops; a claim attempt can hang for
    # many minutes before failing UNAVAILABLE. One bounded retry after a
    # short quiet gap rescues a bench run that lands on a transient wedge.
    # The retry runs in a SUBPROCESS: after a failed in-process claim, jax
    # may cache an initialized CPU backend and never re-attempt the TPU.
    import subprocess

    for attempt in range(2):
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            capture_output=True, timeout=2400,
        )
        if probe.returncode == 0:
            break
        if attempt == 1:
            sys.stderr.write("TPU backend unavailable after retry:\n"
                             + probe.stderr.decode()[-2000:] + "\n")
            sys.exit(1)
        print("backend probe failed; retrying in 120 s", file=sys.stderr)
        time.sleep(120)
    if jax.devices()[0].platform == "cpu":
        # never publish a CPU number under the TPU metric
        sys.stderr.write("refusing to run the TPU bench on CPU\n")
        sys.exit(1)
    import jax.numpy as jnp
    from flax import nnx

    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime import FastCheckerboardGmmCodec

    BASELINE_MS = 97.0
    H, W = 768, 512
    BATCH = 24
    N_BATCHES = 2

    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    trained = _load_bench_weights(model)
    model.update(update_quantiles=True)
    # lanes=4096: best of the 2048/4096/8192 sweep (fewer decode-scan steps
    # while the per-step vector work still fits the VPU)
    codec = FastCheckerboardGmmCodec(model, lanes=4096, cap_divisor=4)

    from flashgmm_tpu.datasets.synthetic import textured_leaves

    seed = [500000]  # held-out: far from the training pool's seed range

    def make_image():
        seed[0] += 1
        return jnp.asarray(textured_leaves(H, W, seed=seed[0]))

    single = jax.device_put(make_image()[None])
    batches = [
        jax.device_put(jnp.stack([make_image() for _ in range(BATCH)]))
        for _ in range(N_BATCHES)
    ]

    # ---- single-image path: fused single-program latency codec with
    # on-chip certification (runtime/latency_codec.py)
    from flashgmm_tpu.runtime import FastLatencyGmmCodec

    lat_codec = FastLatencyGmmCodec(model, lanes=1024, cap_divisor=4)
    data, y_shape4 = lat_codec.encode_certified(single)
    rec = lat_codec.decode(data, y_shape4)
    mse = float(jnp.mean((rec - single) ** 2))  # scalar fetch = real sync
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    float(rec[0, 0, 0, 0])  # pre-compile the slice program used as sync
    t0 = time.time()
    data, _ = lat_codec.encode_certified(single)
    lat_enc = (time.time() - t0) * 1000
    t0 = time.time()
    rec = lat_codec.decode(data, y_shape4)
    # axon's block_until_ready acks dispatch without waiting; a scalar
    # fetch is the only sync that provably waits for execution
    float(rec[0, 0, 0, 0])
    lat_dec = (time.time() - t0) * 1000

    # true on-device single-image latency (tunnel-RTT-free; the number a
    # local-runtime deployment would see — see runtime/latency_probe.py)
    try:
        from flashgmm_tpu.runtime.latency_probe import measure_device_latency

        dev_enc, dev_dec = measure_device_latency(
            lat_codec, single, lat_codec.from_bytes(data, y_shape4),
            y_shape4)
    except Exception:
        dev_enc = dev_dec = float("nan")

    # ---- batched path (compile, then steady-state)
    bdata, bout = codec.encode_to_bytes(batches[0])
    by_shape = tuple(bout["y_hat"].shape)
    brec = codec.decode_bytes(bdata, by_shape)
    float(brec[0, 0, 0, 0])  # drain the device queue before timing

    n_images = BATCH * N_BATCHES
    t0 = time.time()
    datas = []
    pending = None
    for b in batches:
        cur = codec.encode(b)
        for p in (cur["z"], cur["y0"], cur["y1"]):
            for a in (p.n_words, p.states, p.stream):
                a.copy_to_host_async()
        if pending is not None:
            datas.append(codec.to_bytes(pending))
        pending = cur
    datas.append(codec.to_bytes(pending))
    enc_ms = (time.time() - t0) / n_images * 1000

    t0 = time.time()
    recs = [codec.decode_bytes(d, by_shape) for d in datas]
    # programs execute in dispatch order; fetching a scalar from the LAST
    # reconstruction forces completion of all of them (block_until_ready
    # on axon acks without waiting — do not use it for timing)
    float(recs[-1][0, 0, 0, 0])
    dec_ms = (time.time() - t0) / n_images * 1000

    total = enc_ms + dec_ms
    nbytes = len(datas[0]) / BATCH
    result = {
        "metric": (
            f"kodak 768x512 enc+dec ms/image steady-state (batch={BATCH}), ckbd-GMM "
            f"N=192 K=4, full codec on-chip (enc {enc_ms:.1f} + dec {dec_ms:.1f}; "
            f"single-image device latency {dev_enc:.1f}+{dev_dec:.1f} ms "
            f"(wall through the ~27ms/fetch axon tunnel: "
            f"{lat_enc:.0f}+{lat_dec:.0f} ms); "
            f"{nbytes * 8 / (H * W):.3f} bpp, {psnr:.1f} dB PSNR, "
            f"{'trained' if trained else 'random'} weights, held-out "
            f"dead-leaves content)"
        ),
        "value": round(total, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / total, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
