#!/usr/bin/env python
"""Reference-driver-compatible wrapper: test_overlap.py — 8-crop overlap tiling (predict_overlap engine)

Thin alias for `evaluate.py --strategy tiling`; all evaluate.py flags apply.
"""

import sys

from evaluate import main

if __name__ == "__main__":
    main(["--strategy", "tiling"] + sys.argv[1:])
