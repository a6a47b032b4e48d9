#!/usr/bin/env python
"""Reference-driver-compatible wrapper: test_simple.py — crop-volume 8-way flip TTA (predict_simple engine)

Thin alias for `evaluate.py --strategy tta`; all evaluate.py flags apply.
"""

import sys

from evaluate import main

if __name__ == "__main__":
    main(["--strategy", "tta"] + sys.argv[1:])
