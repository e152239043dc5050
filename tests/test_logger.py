"""Logger / progressbar unit tests (SURVEY.md §2.6: colorized console +
color-stripped logbook.txt, LoggingBlock indentation, tqdm bar mirrored to
the logbook on close)."""
import logging

import pytest

from hpvaegan_tpu.utils.logger import LoggingBlock, configure_logging
from hpvaegan_tpu.utils.tools import create_progressbar


@pytest.fixture
def logbook(tmp_path):
    path = tmp_path / "logbook.txt"
    configure_logging(str(path))
    yield path
    # detach the file handler so tmp_path can be cleaned up
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
        h.close()


def test_logbook_strips_ansi_colors(logbook):
    logging.info("\x1b[1mbold title\x1b[0m plain tail")
    text = logbook.read_text()
    assert "bold title plain tail" in text
    assert "\x1b[" not in text  # color codes never reach the file


def test_loggingblock_indents_and_restores(logbook):
    logging.info("outside")
    with LoggingBlock("section", emph=True):
        logging.info("inside")
        with LoggingBlock("nested"):
            logging.info("deep")
    logging.info("after")
    lines = logbook.read_text().splitlines()
    msgs = [line.split("INFO ", 1)[1] for line in lines]
    assert msgs[0] == "outside"
    assert msgs[1] == "==> section"      # colors stripped, ==> kept
    assert msgs[2] == "  inside"         # one indent level
    assert msgs[3] == "  nested"
    assert msgs[4] == "    deep"         # two levels
    assert msgs[5] == "after"            # fully restored


def test_loggingblock_restores_on_exception(logbook):
    with pytest.raises(RuntimeError):
        with LoggingBlock("broken"):
            raise RuntimeError("boom")
    logging.info("recovered")
    assert logbook.read_text().splitlines()[-1].endswith("recovered")


def test_progressbar_mirrors_to_logbook_on_close(logbook):
    bar = create_progressbar(total=4, desc="Train scale [1/2]")
    for _ in range(4):
        bar.update(1)
    bar.close()
    text = logbook.read_text()
    assert "Train scale [1/2]" in text
    assert "4/4" in text  # final bar state, not an intermediate one


def test_progressbar_close_logging_disabled(logbook):
    bar = create_progressbar(total=2, desc="quiet", logging_on_close=False)
    bar.update(2)
    bar.close()
    assert "quiet" not in logbook.read_text()


def test_progressbar_mirrors_on_update(logbook):
    """logging_on_update=True writes an IN-PROGRESS snapshot per update
    (reference utils/tools.py:148-152) — previously accepted and ignored
    (VERDICT r1 item 5)."""
    bar = create_progressbar(total=3, desc="live", logging_on_update=True)
    bar.update(1)
    bar.update(1)
    bar.close()
    text = logbook.read_text()
    assert "1/3" in text and "2/3" in text  # in-progress states
    assert "3/3" not in text                # never reached 3


def test_logbook_level_is_file_only(capsys, logbook):
    """LOGBOOK records (level 1000) reach the file, never the console
    (reference SkipLogbookFilter, utils/logger.py:58-61)."""
    from hpvaegan_tpu.utils.logger import logbook as log_book
    # re-bind the console handler to the NOW-captured sys.stdout (capsys
    # swaps the stream object; the handler holds a reference from fixture
    # time otherwise)
    configure_logging(str(logbook))
    logging.info("console-and-file")
    log_book("file-only-mirror")
    out = capsys.readouterr().out
    text = logbook.read_text()
    assert "console-and-file" in out and "console-and-file" in text
    assert "file-only-mirror" not in out
    assert "file-only-mirror" in text
    assert "LOGBOOK" in text  # level name registered


def test_progressbar_postfix_format(logbook):
    """postfix=True produces the reference bar layout with a postfix slot
    and no stray comma (utils/tools.py:37-47,113-116)."""
    bar = create_progressbar(total=2, desc="pf", postfix=True)
    bar.set_postfix_str("loss=1.0")
    bar.update(2)
    bar.close()
    text = logbook.read_text()
    assert "loss=1.0" in text
    assert ", loss=1.0" not in text  # the reference's comma fix


def test_step_timer_first_fence_is_warmup():
    """StepTimer treats everything before its first device fence as warmup
    (fresh-process first fetches can stall 10-50 s through the relay): the
    first fence reports a rate flagged '(incl. warmup)' so short runs
    (niter < 2*sync_every) still show something, and the second fence
    onward reports the clean post-warmup amortized rate."""
    from hpvaegan_tpu.utils.profiling import StepTimer

    t = StepTimer(sync_every=2)
    t.step(1.0, n=2)                      # first fence: provisional rate
    assert "(incl. warmup)" in t.suffix
    assert t.steps_per_sec > 0
    t.step(1.0, n=2)                      # second fence: clean rate
    assert "(amortized)" in t.suffix
    assert t.steps_per_sec > 0
    t.reset()
    assert t.suffix == ""                 # NaN again after reset
