"""Model zoo: per-architecture per-quality configurations
(compressai/zoo/image.py:54-260).

This environment has no network egress, so pretrained weights must be
supplied as local files (torch ``.pth`` via the converter, or orbax
checkpoints); ``create_model`` builds the right architecture/size for a
(arch, quality) pair and optionally loads weights.
"""

from flax import nnx

from flashgmm_tpu.registry import MODELS

# (quality -> constructor args), mirroring the reference's cfgs
cfgs = {
    "bmshj2018-factorized": {
        1: (128, 192), 2: (128, 192), 3: (128, 192), 4: (128, 192),
        5: (128, 256), 6: (192, 320), 7: (192, 320), 8: (192, 320),
    },
    "bmshj2018-factorized-relu": {
        1: (128, 192), 2: (128, 192), 3: (128, 192), 4: (128, 192),
        5: (128, 256), 6: (192, 320), 7: (192, 320), 8: (192, 320),
    },
    "bmshj2018-hyperprior": {
        1: (128, 192), 2: (128, 192), 3: (128, 192), 4: (128, 192),
        5: (128, 256), 6: (192, 320), 7: (192, 320), 8: (192, 320),
    },
    "mbt2018-mean": {
        1: (128, 192), 2: (128, 192), 3: (128, 192), 4: (128, 192),
        5: (192, 320), 6: (192, 320), 7: (192, 320), 8: (192, 320),
    },
    "mbt2018": {
        1: (192, 192), 2: (192, 192), 3: (192, 192), 4: (192, 192),
        5: (192, 320), 6: (192, 320), 7: (192, 320), 8: (192, 320),
    },
    "cheng2020-anchor": {
        1: (128,), 2: (128,), 3: (128,), 4: (192,), 5: (192,), 6: (192,),
    },
    "cheng2020-attn": {
        1: (128,), 2: (128,), 3: (128,), 4: (192,), 5: (192,), 6: (192,),
    },
    "cheng2020-anchor-checkerboard": {
        1: (128,), 2: (128,), 3: (128,), 4: (192,), 5: (192,), 6: (192,),
    },
    "cheng2020-anchor-checkerboard-gmm": {
        1: (128,), 2: (128,), 3: (128,), 4: (192,), 5: (192,), 6: (192,),
    },
    "elic2022-official": {
        1: (192, 320), 2: (192, 320), 3: (192, 320), 4: (192, 320),
        5: (192, 320), 6: (192, 320),
    },
    "elic2022-gaussian": {
        1: (192, 320), 2: (192, 320), 3: (192, 320), 4: (192, 320),
        5: (192, 320), 6: (192, 320),
    },
    # VBR archs: ONE model serves the whole rate range; "quality" only
    # selects the Gain index at inference (zoo/image_vbr.py:37-41)
    "bmshj2018-hyperprior-vbr": {1: (192, 320)},
    "mbt2018-mean-vbr": {1: (192, 320)},
    "mbt2018-vbr": {1: (192, 320)},
    # video (zoo/video.py): one architecture, qualities are checkpoints
    "ssf2020": {q: () for q in range(1, 10)},
    # pointcloud (reference zoo/pointcloud/image.py analog): default
    # configs, qualities are checkpoints
    "hrtzxf2022-pcc-rec": {1: ()},
    "sfu-pcc-rec-pointnet": {1: ()},
}

model_architectures = dict(MODELS)

# Weights trained in-repo (this environment has no egress, so instead of
# the reference's S3 URL table — zoo/image.py:54-260 — the zoo ships local
# checkpoints under weights/). Keyed (architecture, quality); quality slots
# follow the reference's rate ordering (higher quality = higher rate).
_REPO_ROOT = __import__("pathlib").Path(__file__).resolve().parents[2]
local_weights = {
    # flagship ckbd-GMM, N=192 K=4 (quality 4-6 are the N=192 slots; the
    # extra low-rate lambda=0.001 point lives in the RD curve file only —
    # the reference's q1-3 cfgs are N=128, which that checkpoint is not)
    ("cheng2020-anchor-checkerboard-gmm", 4):
        "weights/ckbd_gmm_n192_k4_q2.npz",          # lambda=0.0025
    ("cheng2020-anchor-checkerboard-gmm", 5):
        "weights/ckbd_gmm_n192_k4_synthetic.npz",   # lambda=0.0067
    ("cheng2020-anchor-checkerboard-gmm", 6):
        "weights/ckbd_gmm_n192_k4_q6.npz",          # lambda=0.013
    ("elic2022-official", 4):
        "weights/elic_gmm_n192_m320_k4_q4.npz",     # lambda=0.0025
    ("elic2022-official", 5):
        "weights/elic_gmm_n192_m320_k4_synthetic.npz",
    ("elic2022-official", 6):
        "weights/elic_gmm_n192_m320_k4_q6.npz",     # lambda=0.013
    ("mbt2018-mean-vbr", 1):
        "weights/mshp_vbr_n192_m320_synthetic.npz",  # ONE model, 8 gains
    ("ssf2020", 5):
        "weights/ssf2020_synthetic.npz",
    ("bmshj2018-factorized", 4):
        "weights/factorized_n128_m192_synthetic.npz",
    # pointcloud codecs (results/synthetic/pointcloud_*.json)
    ("hrtzxf2022-pcc-rec", 1):
        "weights/pcc_hrtzxf2022_synthetic.npz",
    ("sfu-pcc-rec-pointnet", 1):
        "weights/pcc_pointnet_synthetic.npz",
    # round-5 google/sensetime line (results/synthetic/flashgmm_tpu-*.json)
    ("mbt2018-mean", 3): "weights/mshp_n128_m192_synthetic.npz",
    ("bmshj2018-hyperprior", 3): "weights/bmshj_hp_n128_m192_synthetic.npz",
}

# Checkpoints the round-5 training queue is still producing join the table
# automatically as their weight files land; 3-tuple keys carry the metric
# (the reference ships parallel *_ms-ssim model lines), resolved before
# (arch, quality).
_PENDING_SLOTS = {
    ("mbt2018-mean", 4): "weights/mshp_n128_m192_q4.npz",
    ("bmshj2018-hyperprior", 4): "weights/bmshj_hp_n128_m192_q4.npz",
    ("cheng2020-anchor-checkerboard", 3): "weights/ckbd_gc_n128_synthetic.npz",
    ("cheng2020-anchor-checkerboard", 2): "weights/ckbd_gc_n128_q2.npz",
    ("cheng2020-anchor-checkerboard-gmm", 5, "ms-ssim"):
        "weights/ckbd_gmm_n192_k4_q5_msssim.npz",
}
for _k, _rel in _PENDING_SLOTS.items():
    if (_REPO_ROOT / _rel).exists():
        local_weights[_k] = _rel


def _local_weights_path(architecture: str, quality: int,
                        metric: str = "mse"):
    rel = local_weights.get((architecture, quality, metric))
    if rel is None and metric == "mse":
        rel = local_weights.get((architecture, quality))
    if rel is None:
        return None
    p = _REPO_ROOT / rel
    return str(p) if p.exists() else None


def create_model(architecture: str, quality: int = 1, metric: str = "mse",
                 weights_path: str = None, K: int = 4, *, rngs=None, **kwargs):
    """Instantiate a zoo model; optionally load local weights.

    ``weights_path`` may be an orbax checkpoint dir or a torch .pth file.
    """
    if architecture not in cfgs:
        raise ValueError(f'Unknown architecture "{architecture}"')
    if quality not in cfgs[architecture]:
        raise ValueError(
            f'Invalid quality "{quality}" for {architecture}, '
            f"expected one of {sorted(cfgs[architecture])}"
        )
    args = cfgs[architecture][quality]
    cls = MODELS[architecture]
    import inspect

    sig = inspect.signature(cls.__init__)
    ckwargs = dict(kwargs)
    names = ["N", "M"]
    for name, val in zip(names, args):
        if name in sig.parameters:
            ckwargs[name] = val
    if "K" in sig.parameters:
        ckwargs.setdefault("K", K)
    if "vr_entbttlnck" in sig.parameters:
        # the shipped VBR checkpoint trains the variable-step z bottleneck
        ckwargs.setdefault("vr_entbttlnck", True)
    model = cls(**ckwargs, rngs=rngs or nnx.Rngs(0))

    if weights_path:
        import os

        if os.path.isdir(weights_path):
            from flashgmm_tpu.utils.checkpoint import load_checkpoint

            load_checkpoint(weights_path, model)
        elif weights_path.endswith(".npz"):
            from .npz import load_npz_weights

            load_npz_weights(model, weights_path)
        else:
            from .torch_convert import load_checkpoint_file

            load_checkpoint_file(model, weights_path, strict=False)
    return model


def image_models(architecture, quality=1, metric="mse", pretrained=False,
                 weights_path=None, **kwargs):
    """CompressAI-style zoo entry point (zoo/__init__.py:43-70).

    ``pretrained=True`` resolves weights from the in-repo ``local_weights``
    table (the no-egress stand-in for the reference's S3 URLs); pass
    ``weights_path=`` to load any other local checkpoint.
    """
    if pretrained and weights_path is None:
        weights_path = _local_weights_path(architecture, quality, metric)
        if weights_path is None:
            raise RuntimeError(
                f"No shipped weights for ({architecture}, quality={quality}, "
                f"{metric}) — available: "
                f"{sorted(str(k) for k in local_weights)}; or pass "
                "weights_path= with a local checkpoint"
            )
    return create_model(architecture, quality, metric, weights_path, **kwargs)


# VBR models: one model spans the 8-lambda sweep (s = 0..7)
cfgs_vbr = {
    "bmshj2018-hyperprior-vbr": (192, 320),
    "mbt2018-mean-vbr": (192, 320),
}

# video zoo (ssf2020): per-quality lambda only; single architecture
cfgs_video = {
    "ssf2020": {q: () for q in range(1, 10)},
}
