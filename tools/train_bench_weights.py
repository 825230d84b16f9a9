"""Train the flagship on natural-statistics synthetic content (dead-leaves;
flashgmm_tpu/datasets/synthetic.py) so bench.py runs at a realistic
operating point (~0.5-1.0 bpp), and save weights for bench.py.

Logs a JSON line per probe; saves weights periodically so an interrupted
run still leaves usable weights. Held-out RD probe = forward-pass bpp +
PSNR on unseen 768x512 images (the reference's periodic-Kodak-probe
analog, train_ckbd_gmm.py:66-114).

Usage: python tools/train_bench_weights.py [--steps N] [--max-hours H]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import optax
from flax import nnx

from flashgmm_tpu.datasets.synthetic import make_pool, random_crop
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.parallel import make_train_state
from flashgmm_tpu.parallel.train import data_parallel_train_step

p = argparse.ArgumentParser()
p.add_argument("--steps", type=int, default=20000)
p.add_argument("--max-hours", type=float, default=3.0)
p.add_argument("--lmbda", type=float, default=0.0067)
p.add_argument("--bs", type=int, default=8)
p.add_argument("--crop", type=int, default=256)
p.add_argument("--lr", type=float, default=1e-4)
p.add_argument("--out", default="weights/ckbd_gmm_n192_k4_synthetic.npz")
p.add_argument("--pool", type=int, default=40)
p.add_argument("--resume", default=None,
               help="npz weights to load before training (fresh optimizer)")
p.add_argument("--arch", default="ckbd",
               choices=["ckbd", "elic", "factorized", "vbr",
                        "mshp", "bmshj", "ckbd-gc"])
p.add_argument("--N", type=int, default=128,
               help="factorized/mshp/bmshj/ckbd-gc: g_a/g_s width")
p.add_argument("--M", type=int, default=192,
               help="factorized/mshp/bmshj: latent channels")
p.add_argument("--metric", default="mse", choices=["mse", "ms-ssim"],
               help="distortion term (reference trains parallel MSE and "
               "MS-SSIM model lines)")
p.add_argument("--cpu", action="store_true",
               help="train on the host CPU (don't claim the TPU tunnel); "
               "for small configs, e.g. the standalone-codec FactorizedPrior")
args = p.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

if args.arch == "factorized":
    from flashgmm_tpu.models.google import FactorizedPrior

    model = FactorizedPrior(N=args.N, M=args.M, rngs=nnx.Rngs(0))
    if args.out == "weights/ckbd_gmm_n192_k4_synthetic.npz":
        args.out = f"weights/factorized_n{args.N}_m{args.M}_synthetic.npz"
elif args.arch == "elic":
    from flashgmm_tpu.models.elic_gmm import Elic2022GMM

    model = Elic2022GMM(N=192, M=320, K=4, rngs=nnx.Rngs(0))
    if args.out == "weights/ckbd_gmm_n192_k4_synthetic.npz":
        args.out = "weights/elic_gmm_n192_m320_k4_synthetic.npz"
elif args.arch == "vbr":
    from flashgmm_tpu.models.vbr import VBR_GAINS, MeanScaleHyperpriorVbr

    # vr_entbttlnck so the sweep exercises the variable-step z path
    model = MeanScaleHyperpriorVbr(N=192, M=320, vr_entbttlnck=True,
                                   rngs=nnx.Rngs(0))
    # per-gain lambda: rate weight scales with the gain squared (the
    # quantization step is 1/gain, so distortion weight ~ gain^2)
    VBR_LMBDAS = [args.lmbda * (g / VBR_GAINS[-1]) ** 2 for g in VBR_GAINS]
    if args.out == "weights/ckbd_gmm_n192_k4_synthetic.npz":
        args.out = "weights/mshp_vbr_n192_m320_synthetic.npz"
elif args.arch == "mshp":
    from flashgmm_tpu.models.google import MeanScaleHyperprior

    model = MeanScaleHyperprior(N=args.N, M=args.M, rngs=nnx.Rngs(0))
    if args.out == "weights/ckbd_gmm_n192_k4_synthetic.npz":
        args.out = f"weights/mshp_n{args.N}_m{args.M}_synthetic.npz"
elif args.arch == "bmshj":
    from flashgmm_tpu.models.google import ScaleHyperprior

    model = ScaleHyperprior(N=args.N, M=args.M, rngs=nnx.Rngs(0))
    if args.out == "weights/ckbd_gmm_n192_k4_synthetic.npz":
        args.out = f"weights/bmshj_hp_n{args.N}_m{args.M}_synthetic.npz"
elif args.arch == "ckbd-gc":
    from flashgmm_tpu.models.sensetime import Cheng2020AnchorCheckerboard

    model = Cheng2020AnchorCheckerboard(N=args.N, rngs=nnx.Rngs(0))
    if args.out == "weights/ckbd_gmm_n192_k4_synthetic.npz":
        args.out = f"weights/ckbd_gc_n{args.N}_synthetic.npz"
else:
    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
if args.resume:
    from flashgmm_tpu.zoo import load_npz_weights

    n_loaded = load_npz_weights(model, args.resume)
    print(f"resumed {n_loaded} param tensors from {args.resume}", flush=True)
# lr drops 10x for the last 15% of training (reference uses MultiStepLR)
sched = optax.piecewise_constant_schedule(
    args.lr, {int(args.steps * 0.85): 0.1}
)
opt_net, opt_aux = make_train_state(model, sched, 1e-3)

print(f"generating pool of {args.pool} 512x768 dead-leaves images...", flush=True)
t0 = time.time()
pool = make_pool(args.pool, 512, 768, seed0=0)
heldout = np.stack(make_pool(2, 768, 512, seed0=100000))
print(f"pool done in {time.time()-t0:.0f}s", flush=True)

rs = np.random.RandomState(1)
key = jax.random.key(0)


def save_weights(tag=""):
    from flashgmm_tpu.zoo import save_npz_weights

    save_npz_weights(model, args.out)
    print(json.dumps({"event": "saved", "tag": tag, "path": args.out}), flush=True)


if args.arch == "vbr":
    from flashgmm_tpu.parallel.train import vbr_train_step

    def train_step(m, on, oa, x, k, lmbda):
        # sample the gain level per step (reference VBR recipe); ONE
        # compiled program serves all 8 levels (s and lambda are traced)
        s = int(rs.randint(0, len(VBR_GAINS)))
        return vbr_train_step(m, on, oa, x, k, jnp.int32(s),
                              jnp.float32(VBR_LMBDAS[s]))
else:
    def train_step(m, on, oa, x, k, lmbda):
        return data_parallel_train_step(m, on, oa, x, k, lmbda,
                                        metric=args.metric)


@nnx.jit
def eval_probe(m, x):
    if args.arch == "vbr":
        out = m(x, training=False, stage=2, s=6)
    else:
        out = m(x, training=False)
    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
    bpp = sum(
        jnp.sum(-jnp.log2(l)) for l in jax.tree.leaves(out["likelihoods"])
    ) / num_pixels
    mse = jnp.mean((out["x_hat"] - x) ** 2)
    return bpp, -10.0 * jnp.log10(mse)


t0 = time.time()
x = jnp.asarray(random_crop(pool, args.bs, args.crop, rs))
out = train_step(model, opt_net, opt_aux, x, key, args.lmbda)
print(f"compile {time.time()-t0:.0f}s loss={float(out['loss']):.3f}", flush=True)

t0 = time.time()
last_good = 0
for i in range(args.steps):
    key, sub = jax.random.split(key)
    x = jnp.asarray(random_crop(pool, args.bs, args.crop, rs))
    out = train_step(model, opt_net, opt_aux, x, sub, args.lmbda)
    if i % 250 == 0:
        loss = float(out["loss"])
        if not np.isfinite(loss):
            print(json.dumps({"event": "nan", "step": i}), flush=True)
            break
        print(
            json.dumps(
                {
                    "step": i,
                    "loss": round(loss, 4),
                    "bpp": round(float(out["bpp_loss"]), 4),
                    "mse": round(float(out["mse_loss"]), 6),
                    "s_per_step": round((time.time() - t0) / (i + 1), 3),
                }
            ),
            flush=True,
        )
    if i > 0 and i % 1000 == 0:
        bpp, psnr = eval_probe(model, heldout)
        print(
            json.dumps(
                {
                    "event": "probe",
                    "step": i,
                    "heldout_bpp": round(float(bpp), 4),
                    "heldout_psnr": round(float(psnr), 2),
                }
            ),
            flush=True,
        )
        save_weights(f"step{i}")
    if (time.time() - t0) > args.max_hours * 3600:
        print(json.dumps({"event": "time_limit", "step": i}), flush=True)
        break

bpp, psnr = eval_probe(model, heldout)
print(
    json.dumps(
        {
            "event": "final",
            "heldout_bpp": round(float(bpp), 4),
            "heldout_psnr": round(float(psnr), 2),
        }
    ),
    flush=True,
)
save_weights("final")
