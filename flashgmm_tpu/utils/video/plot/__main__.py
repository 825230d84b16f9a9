"""Plot video RD curves — shares the image plot implementation
(cf. compressai/utils/video/plot)."""

import sys

from flashgmm_tpu.utils.plot.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
