"""Train Elic2022GMM (reference: train_elic_gmm.py)."""

import sys

from examples.train import main

if __name__ == "__main__":
    sys.exit(main(["--model", "elic2022-official"] + sys.argv[1:]))
