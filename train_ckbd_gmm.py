"""Train Cheng2020AnchorCheckerboardGMMv2 (reference: train_ckbd_gmm.py).

Thin wrapper over the shared training loop (examples/train.py) with the
checkerboard-GMM defaults: N channels, K mixtures, RD lambda, net/aux
optimizers, NaN skip, MultiStep LR, periodic eval, checkpointing.
"""

import sys

from examples.train import main

if __name__ == "__main__":
    sys.exit(
        main(["--model", "cheng2020-anchor-checkerboard-gmm"] + sys.argv[1:])
    )
