#!/usr/bin/env python
"""Reference-driver-compatible wrapper: test_cls.py — 8-crop tiling + flip TTA + ensembling (predict_cls engine)

Thin alias for `evaluate.py --strategy tiling_tta`; all evaluate.py flags apply.
"""

import sys

from evaluate import main

if __name__ == "__main__":
    main(["--strategy", "tiling_tta"] + sys.argv[1:])
