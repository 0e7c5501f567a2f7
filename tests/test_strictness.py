"""Degraded-input paths must fail LOUD (VERDICT r2 weak #5).

A run pointed at a slightly-wrong SD/checkpoint path previously fell back
silently (HashTokenizer / random init) and looked healthy while producing
garbage.  Now: ERROR logs always, fatal under ``strict_pretrained: true``.
"""

import logging

import pytest

from synfmc_tpu.config import ConfigDict
from synfmc_tpu.data.tokenizer import HashTokenizer, load_tokenizer
from synfmc_tpu.training.trainers import load_pretrained


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.records = []

    def emit(self, record):
        self.records.append(record)


@pytest.fixture
def captured():
    h = _Capture()
    logger = logging.getLogger("synfmc")
    old_level = logger.level
    logger.addHandler(h)
    logger.setLevel(logging.DEBUG)
    yield h
    logger.removeHandler(h)
    logger.setLevel(old_level)


def test_tokenizer_fallback_logs_error(captured):
    tok = load_tokenizer("/no/such/sd/dir")
    assert isinstance(tok, HashTokenizer)
    errs = [r for r in captured.records if r.levelno >= logging.ERROR]
    assert errs and "HashTokenizer" in errs[0].getMessage()


def test_tokenizer_fallback_strict_raises():
    with pytest.raises(FileNotFoundError, match="strict_pretrained"):
        load_tokenizer("/no/such/sd/dir", strict=True)


def test_tokenizer_no_path_stays_quiet(captured):
    # tests/fixtures legitimately run without an SD checkpoint
    tok = load_tokenizer(None)
    assert isinstance(tok, HashTokenizer)
    assert not [r for r in captured.records if r.levelno >= logging.ERROR]


def test_load_pretrained_missing_path_logs_error(captured):
    cfg = ConfigDict({"lora_ckpt": "/no/such/lora.ckpt"})
    logger = logging.getLogger("synfmc")
    load_pretrained({}, cfg, "cam", logger)
    errs = [r for r in captured.records if r.levelno >= logging.ERROR]
    assert errs and "/no/such/lora.ckpt" in errs[0].getMessage()


def test_load_pretrained_missing_path_strict_raises():
    cfg = ConfigDict({"lora_ckpt": "/no/such/lora.ckpt", "strict_pretrained": True})
    with pytest.raises(FileNotFoundError, match="strict_pretrained"):
        load_pretrained({}, cfg, "cam", logging.getLogger("synfmc"))


def test_load_pretrained_placeholder_stays_quiet(captured):
    # shipped configs carry '[path to ...]' placeholders — explicitly not a path
    cfg = ConfigDict({"lora_ckpt": "[path to the image lora ckpt]",
                      "strict_pretrained": True})
    load_pretrained({}, cfg, "cam", logging.getLogger("synfmc"))
    assert not [r for r in captured.records if r.levelno >= logging.ERROR]
