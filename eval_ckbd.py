"""Evaluate the checkerboard-GMM model on an image directory
(reference: eval_ckbd.py). ``--real`` switches from estimated-bpp forward()
evaluation to actual rANS coding with bpp from byte lengths.

    python eval_ckbd.py <image_dir> [--real] [-p checkpoint] [-N 192] [-K 4]
"""

import sys

from flashgmm_tpu.utils.eval_model.__main__ import main


def _translate(argv):
    out = ["checkpoint" if any(a in ("-p", "--path") for a in argv) else "random"]
    out += [a for a in argv]
    out += ["-a", "cheng2020-anchor-checkerboard-gmm"]
    return out


if __name__ == "__main__":
    sys.exit(main(_translate(sys.argv[1:])))
