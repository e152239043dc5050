"""Progress bars mirrored into the logbook (reference: utils/tools.py).

The reference subclasses tqdm (tools.py:108-159) to mirror the bar's state
into the logbook at the file-only LOGBOOK level — on close always, and on
every ``update`` when ``logging_on_update`` is set.  Every reference
``create_progressbar`` argument is honored here (tools.py:12-21):
``train`` -> miniters=1, ``offset`` -> vertical position, ``postfix`` ->
the green-postfix bar format with the reference's comma fix.
"""
from __future__ import annotations

from tqdm import tqdm

from .logger import logbook as _logbook

__all__ = ["create_progressbar"]


class _LoggedTqdm(tqdm):
    def __init__(self, *args, logging_on_close: bool = True,
                 logging_on_update: bool = False, **kwargs):
        self._log_on_close = logging_on_close
        self._log_on_update = logging_on_update
        self._mirror_closed = False
        super().__init__(*args, **kwargs)

    @staticmethod
    def format_meter(n, total, elapsed, ncols=None, prefix="", ascii=False,
                     unit="it", unit_scale=False, rate=None, bar_format=None,
                     postfix=None, unit_divisor=1000, **kwargs):
        # tqdm prepends ", " to a set postfix; the reference strips it
        # (utils/tools.py:113-135 "get rid of that stupid comma")
        meter = tqdm.format_meter(
            n=n, total=total, elapsed=elapsed, ncols=ncols, prefix=prefix,
            ascii=ascii, unit=unit, unit_scale=unit_scale, rate=rate,
            bar_format=bar_format, postfix=postfix,
            unit_divisor=unit_divisor, **kwargs)
        if postfix:
            meter = meter.replace(", %s" % postfix, "%s" % postfix)
        return meter

    def update(self, n=1):
        # mirror the in-progress bar into the logbook (reference
        # utils/tools.py:148-152); LOGBOOK level = file only
        if self._log_on_update and not self.disable:
            _logbook(str(self))
        return super().update(n)

    def close(self):
        if self._log_on_close and not self.disable and not self._mirror_closed:
            _logbook(str(self))
            self._mirror_closed = True
        super().close()


def create_progressbar(iterable=None, desc: str = "", train: bool = False,
                       unit: str = "it", initial: int = 0, offset: int = 0,
                       invert_iterations: bool = False,
                       logging_on_update: bool = False,
                       logging_on_close: bool = True, postfix: bool = False,
                       total=None):
    """Reference-arg-compatible bar factory (utils/tools.py:12-67)."""
    bar_format = None
    if postfix:
        # the reference's custom layout ends in a green postfix with its
        # leading comma removed (utils/tools.py:37-47,113-116); tqdm >= 4.62
        # exposes {postfix} directly so the comma never appears
        rate = "{rate_inv_fmt}" if invert_iterations else "{rate_noinv_fmt}"
        bar_format = ("{desc}: {percentage:3.0f}%|{bar}| {n_fmt}/{total_fmt} "
                      "{elapsed}<{remaining} " + rate +
                      " \x1b[32m{postfix}\x1b[0m")
    return _LoggedTqdm(iterable=iterable, total=total, desc=desc,
                       unit=unit, initial=initial, position=offset,
                       miniters=1 if train else None,
                       logging_on_close=logging_on_close,
                       logging_on_update=logging_on_update,
                       bar_format=bar_format,
                       dynamic_ncols=True, smoothing=0.3)
