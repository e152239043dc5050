"""Logging: colorized console + color-stripped logbook file, indented blocks.

Functional re-design of the reference's logger (utils/logger.py:69-138)
with the same observables:

* a custom ``LOGBOOK`` level 1000 (reference utils/tools.py:77-100 via
  ``addLoggingLevel``) used to mirror tqdm bars: LOGBOOK records reach the
  logbook FILE but are skipped on the console (SkipLogbookFilter,
  reference utils/logger.py:58-61);
* console lines carry a dim timestamp + emphasized section titles
  (``==>`` in cyan, reference utils/logger.py:122-127), the file gets
  bracket-free color-stripped lines;
* ``LoggingBlock`` context managers indent nested sections.

Conscious simplification (PARITY.md): one format string with
``%(levelname)s`` for both sinks instead of the reference's two
hand-built colorama format strings — the information content is a
superset of the reference's.
"""
from __future__ import annotations

import logging
import re
import sys

__all__ = ["configure_logging", "LoggingBlock", "LOGBOOK", "logbook"]

_ANSI_RE = re.compile(r"\x1b\[[0-9;]*m")
_INDENT = {"level": 0}

# custom level for tqdm mirrors: file-only (reference utils/tools.py:84 —
# addLoggingLevel("LOGBOOK", 1000))
LOGBOOK = 1000


def _ensure_logbook_level() -> None:
    if logging.getLevelName(LOGBOOK) != "LOGBOOK":
        logging.addLevelName(LOGBOOK, "LOGBOOK")


def logbook(msg: str) -> None:
    """Log at the LOGBOOK level: written to logbook.txt, skipped on the
    console (the reference's ``logging.logbook``)."""
    _ensure_logbook_level()
    logging.log(LOGBOOK, msg)


class _IndentFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        record.msg = "  " * _INDENT["level"] + str(record.msg)
        return True


class _SkipLogbookFilter(logging.Filter):
    """Console drops LOGBOOK records (reference utils/logger.py:58-61)."""

    def filter(self, record: logging.LogRecord) -> bool:
        return record.levelno != LOGBOOK


class _StripColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        return _ANSI_RE.sub("", super().format(record))


def configure_logging(logbook_path) -> None:
    """``logbook_path=None`` configures console-only logging — used by
    non-primary processes under --distributed, which must not write into
    the experiment tree (utils/saver.py multi-host rule)."""
    _ensure_logbook_level()
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)

    # dim timestamp on the console (reference get_default_logging_format
    # colorize=True, utils/logger.py:13-22)
    console_fmt = ("\x1b[2m%(asctime)s\x1b[0m %(levelname)s %(message)s"
                   if sys.stdout.isatty()
                   else "%(asctime)s %(levelname)s %(message)s")
    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(logging.Formatter(console_fmt, datefmt="%H:%M:%S"))
    console.addFilter(_IndentFilter())
    console.addFilter(_SkipLogbookFilter())
    root.addHandler(console)

    if logbook_path is not None:
        fileh = logging.FileHandler(logbook_path, mode="a")
        fileh.setFormatter(_StripColorFormatter(
            "%(asctime)s %(levelname)s %(message)s", datefmt="%H:%M:%S"))
        root.addHandler(fileh)


class LoggingBlock:
    """Indented logging section (utils/logger.py:122-138)."""

    def __init__(self, title: str, emph: bool = False):
        self.title = title
        self.emph = emph

    def __enter__(self):
        if self.emph:
            # cyan "==>" + bright title (reference utils/logger.py:124-127)
            logging.info(f"\x1b[36m==>\x1b[0m \x1b[1m{self.title}\x1b[0m")
        else:
            logging.info(self.title)
        _INDENT["level"] += 1
        return self

    def __exit__(self, *exc):
        _INDENT["level"] = max(0, _INDENT["level"] - 1)
        return False
