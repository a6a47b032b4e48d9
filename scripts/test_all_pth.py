#!/usr/bin/env python
"""Reference-driver-compatible wrapper: test_all_pth.py — checkpoint-sweep eval with CSV

Thin alias for `evaluate.py --strategy sweep`; all evaluate.py flags apply.
"""

import sys

from evaluate import main

if __name__ == "__main__":
    main(["--strategy", "sweep"] + sys.argv[1:])
