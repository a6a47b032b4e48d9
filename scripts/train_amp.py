#!/usr/bin/env python
"""Reference-driver-compatible wrapper: train_amp.py — bf16 mixed-precision
training (the TPU equivalent of GradScaler/autocast, incl. the reference's
poly-LR restart at epoch 249; train_amp.py:172,272-278)."""

import sys

from train import main

if __name__ == "__main__":
    main(["--amp"] + sys.argv[1:])
