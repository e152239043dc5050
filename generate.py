#!/usr/bin/env python
"""Launcher shim for the standalone sampling CLI (an extension over the
reference, which has no generation entry point — SURVEY.md §7 "known
quirks").  Implementation: hpvaegan_tpu/cli/generate.py (console script
``hpvaegan-generate``).
"""
from hpvaegan_tpu.cli.generate import main

if __name__ == "__main__":
    main()
