#!/usr/bin/env python
"""Reference-driver-compatible wrapper: train_no_amp.py — fp32 training."""

import sys

from train import main

if __name__ == "__main__":
    main(sys.argv[1:])
