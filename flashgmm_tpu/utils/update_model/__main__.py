"""Post-training model update: materialize the entropy-coder CDF tables.

Equivalent of ``python -m compressai.utils.update_model``
(utils/update_model/__main__.py:29-172): load a checkpoint, run
``model.update(force=True)``, re-save with a content-hash suffix.
"""

import argparse
import hashlib
import sys
from pathlib import Path


def setup_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("filepath", type=str, help="checkpoint path")
    p.add_argument("-a", "--architecture", required=True)
    p.add_argument("-N", type=int, default=192)
    p.add_argument("-M", type=int, default=320)
    p.add_argument("-K", type=int, default=4)
    p.add_argument("-d", "--dir", type=str, help="output directory")
    p.add_argument("--name", type=str, help="output name stem")
    p.add_argument("--no-update", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = setup_args(argv)

    import inspect

    from flax import nnx

    from flashgmm_tpu.registry import MODELS
    from flashgmm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cls = MODELS[args.architecture]
    sig = inspect.signature(cls.__init__)
    kwargs = {k: getattr(args, k) for k in ("N", "M", "K") if k in sig.parameters}
    model = cls(**kwargs, rngs=nnx.Rngs(0))
    load_checkpoint(args.filepath, model)

    if not args.no_update:
        model.update(force=True, update_quantiles=True)

    state_bytes = str(nnx.state(model)).encode()
    h = hashlib.sha256(state_bytes).hexdigest()[:8]
    outdir = Path(args.dir or Path(args.filepath).parent)
    stem = args.name or Path(args.filepath).name
    outpath = outdir / f"{stem}-{h}"
    save_checkpoint(outpath, model)
    print(f"Saved updated model to {outpath}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
