"""Logging: timed-rotating file logger + train-log writer.

The reference defines (and never instantiates) a TimedRotatingFileHandler
``Logger`` (``model/util.py:74-93``) and appends per-epoch lines to
``train_log.txt`` (``train_net_unet.py:235-238``).  Both live here.
"""

from __future__ import annotations

import logging
import os
from logging import handlers


class Logger:
    """Console + timed-rotating-file logger."""

    LEVELS = {
        "debug": logging.DEBUG,
        "info": logging.INFO,
        "warning": logging.WARNING,
        "error": logging.ERROR,
        "crit": logging.CRITICAL,
    }

    def __init__(
        self,
        filename: str,
        level: str = "info",
        when: str = "D",
        back_count: int = 3,
        fmt: str = "%(asctime)s - %(levelname)s: %(message)s",
    ):
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        self.logger = logging.getLogger(filename)
        self.logger.setLevel(self.LEVELS.get(level, logging.INFO))
        formatter = logging.Formatter(fmt)
        if not self.logger.handlers:
            sh = logging.StreamHandler()
            sh.setFormatter(formatter)
            self.logger.addHandler(sh)
            th = handlers.TimedRotatingFileHandler(
                filename=filename, when=when, backupCount=back_count,
                encoding="utf-8",
            )
            th.setFormatter(formatter)
            self.logger.addHandler(th)


class TrainLog:
    """Append-only per-epoch train log (``train_log.txt`` format)."""

    def __init__(self, checkpoint_dir: str):
        os.makedirs(checkpoint_dir, exist_ok=True)
        self.path = os.path.join(checkpoint_dir, "train_log.txt")

    def write(self, epoch: int, loss: float, bpp: float, mse: float) -> None:
        line = "[Epoch %04d TRAIN] Loss: %.4f bpp: %.4f mse: %.4f" % (
            epoch, loss, bpp, mse,
        )
        with open(self.path, "a") as fd:
            fd.write(line + "\n")
