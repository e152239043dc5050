#!/usr/bin/env python
"""Launcher shim: ``python train_video_baselines.py`` == reference
invocation style (reference train_video_baselines.py:216).  Implementation:
hpvaegan_tpu/cli/train_video_baselines.py (console script
``hpvaegan-train-video-baselines``).
"""
from hpvaegan_tpu.cli.train_video_baselines import main

if __name__ == "__main__":
    main()
