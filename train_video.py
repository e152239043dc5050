#!/usr/bin/env python
"""Launcher shim: ``python train_video.py`` == reference invocation style
(reference train_video.py:261).  Implementation:
hpvaegan_tpu/cli/train_video.py (console script ``hpvaegan-train-video``).
"""
from hpvaegan_tpu.cli.train_video import main

if __name__ == "__main__":
    main()
