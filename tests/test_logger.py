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
    assert msgs[1] == "section"          # emphasis stripped in the file
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
