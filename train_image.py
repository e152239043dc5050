#!/usr/bin/env python
"""Launcher shim: ``python train_image.py`` == reference invocation style
(reference train_image.py:275).  Implementation:
hpvaegan_tpu/cli/train_image.py (console script ``hpvaegan-train-image``).
"""
from hpvaegan_tpu.cli.train_image import main

if __name__ == "__main__":
    main()
