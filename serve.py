#!/usr/bin/env python
"""Launcher shim for the persistent sampling server (no serving surface
exists in the reference — SURVEY.md §1).  Implementation:
hpvaegan_tpu/cli/serve.py (console script ``hpvaegan-serve``).
"""
from hpvaegan_tpu.cli.serve import main

if __name__ == "__main__":
    main()
