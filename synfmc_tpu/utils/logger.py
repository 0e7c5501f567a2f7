"""Run logging: colored stdout on process 0 + per-process log files.

Parity with the reference's detectron2-derived ``setup_logger``
(fmc/utils/util.py:82-124): rank-0 colored console, buffered per-rank
``log.txt`` files; rank maps to ``jax.process_index()``.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
import time


class _ColorFormatter(logging.Formatter):
    GREY, YELLOW, RED, RESET = "\x1b[38;5;245m", "\x1b[33;1m", "\x1b[31;1m", "\x1b[0m"

    def format(self, record):
        msg = super().format(record)
        if record.levelno >= logging.ERROR:
            return f"{self.RED}{msg}{self.RESET}"
        if record.levelno >= logging.WARNING:
            return f"{self.YELLOW}{msg}{self.RESET}"
        return msg


@functools.lru_cache(maxsize=None)
def setup_logger(output_dir: str | None = None, process_index: int = 0, name: str = "synfmc_tpu"):
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    fmt = "[%(asctime)s %(name)s]: %(levelname)s %(message)s"

    if process_index == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(_ColorFormatter(fmt, datefmt="%m/%d %H:%M:%S"))
        logger.addHandler(ch)

    if output_dir:
        filename = os.path.join(output_dir, "log.txt")
        if process_index > 0:
            filename = f"{filename}.rank{process_index}"
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.StreamHandler(open(filename, "a", buffering=1024))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter(fmt, datefmt="%m/%d %H:%M:%S"))
        logger.addHandler(fh)
    return logger


def format_time(seconds: float) -> str:
    """Human ETA string (reference fmc/utils/util.py:127-148)."""
    days, rem = divmod(int(seconds), 86400)
    hours, rem = divmod(rem, 3600)
    minutes, secs = divmod(rem, 60)
    if days > 0:
        return f"{days}d{hours}h{minutes}m"
    if hours > 0:
        return f"{hours}h{minutes}m"
    if minutes > 0:
        return f"{minutes}m{secs}s"
    return f"{seconds:.1f}s"


def instantiate_from_config(config: dict):
    """Instantiate `{"target": "module.path.Class", "params": {...}}` configs
    (reference fmc/utils/util.py:16-25) — used by the train_data.target key."""
    import importlib

    if "target" not in config:
        raise KeyError("expected a 'target' key")
    module_name, _, class_name = str(config["target"]).rpartition(".")
    cls = getattr(importlib.import_module(module_name), class_name)
    return cls(**dict(config.get("params") or {}))
