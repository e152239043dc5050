"""Logging: colorized console + color-stripped logbook file, indented blocks.

Functional re-design of the reference's logger (utils/logger.py:69-138):
same observable behavior — a root logger writing colored lines to stdout and
plain lines to ``logbook.txt``, with ``LoggingBlock`` context managers that
indent nested sections — without the reference's custom tqdm plumbing.
"""
from __future__ import annotations

import logging
import re
import sys

__all__ = ["configure_logging", "LoggingBlock"]

_ANSI_RE = re.compile(r"\x1b\[[0-9;]*m")
_INDENT = {"level": 0}


class _IndentFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        record.msg = "  " * _INDENT["level"] + str(record.msg)
        return True


class _StripColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        return _ANSI_RE.sub("", super().format(record))


def configure_logging(logbook_path: str) -> None:
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)

    fmt = "%(asctime)s %(levelname)s %(message)s"
    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(logging.Formatter(fmt, datefmt="%H:%M:%S"))
    console.addFilter(_IndentFilter())
    root.addHandler(console)

    fileh = logging.FileHandler(logbook_path, mode="a")
    fileh.setFormatter(_StripColorFormatter(fmt, datefmt="%H:%M:%S"))
    root.addHandler(fileh)


class LoggingBlock:
    """Indented logging section (utils/logger.py:122-138)."""

    def __init__(self, title: str, emph: bool = False):
        self.title = title
        self.emph = emph

    def __enter__(self):
        if self.emph:
            logging.info(f"\x1b[1m{self.title}\x1b[0m")
        else:
            logging.info(self.title)
        _INDENT["level"] += 1
        return self

    def __exit__(self, *exc):
        _INDENT["level"] = max(0, _INDENT["level"] - 1)
        return False
