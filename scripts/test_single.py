#!/usr/bin/env python
"""Reference-driver-compatible wrapper: test.py — single-patch eval (predict engine)

Thin alias for `evaluate.py --strategy single`; all evaluate.py flags apply.
"""

import sys

from evaluate import main

if __name__ == "__main__":
    main(["--strategy", "single"] + sys.argv[1:])
