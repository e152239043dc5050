"""Progress bars mirrored into the logbook (reference: utils/tools.py).

The reference subclasses tqdm to append final bar snapshots to the logbook
(tools.py:108-159); here a thin wrapper logs the closing state through the
standard logger, which already writes to logbook.txt.
"""
from __future__ import annotations

import logging

from tqdm import tqdm

__all__ = ["create_progressbar"]


class _LoggedTqdm(tqdm):
    def __init__(self, *args, logging_on_close: bool = True,
                 logging_on_update: bool = False, **kwargs):
        self._log_on_close = logging_on_close
        self._log_on_update = logging_on_update
        super().__init__(*args, **kwargs)

    def close(self):
        if self._log_on_close and not self.disable:
            logging.info(str(self))
        super().close()


def create_progressbar(iterable=None, desc: str = "", train: bool = False,
                       offset: int = 0, logging_on_update: bool = False,
                       logging_on_close: bool = True, postfix: bool = False,
                       total=None, **kwargs):
    return _LoggedTqdm(iterable=iterable, total=total, desc=desc,
                       logging_on_close=logging_on_close,
                       logging_on_update=logging_on_update,
                       dynamic_ncols=True, smoothing=0.3)
