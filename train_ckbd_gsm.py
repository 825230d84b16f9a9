"""Train Cheng2020AnchorCheckerboard — the single-Gaussian (GSM)
checkerboard model (reference: train_ckbd_gsm.py, which trains
compressai.models.sensetime.Cheng2020AnchorCheckerboard).

Thin wrapper over the shared training loop (examples/train.py) like the
GMM/ELIC wrappers: RD loss, net/aux optimizers, NaN skip, MultiStep LR,
periodic eval, checkpointing.
"""

import sys

from examples.train import main

if __name__ == "__main__":
    sys.exit(
        main(["--model", "cheng2020-anchor-checkerboard"] + sys.argv[1:])
    )
