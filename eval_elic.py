"""Evaluate the ELIC-GMM model on an image directory
(reference: eval_elic.py).

    python eval_elic.py <image_dir> [--real] [-p checkpoint]
"""

import sys

from flashgmm_tpu.utils.eval_model.__main__ import main


def _translate(argv):
    out = ["checkpoint" if any(a in ("-p", "--path") for a in argv) else "random"]
    out += [a for a in argv]
    out += ["-a", "elic2022-official"]
    return out


if __name__ == "__main__":
    sys.exit(main(_translate(sys.argv[1:])))
