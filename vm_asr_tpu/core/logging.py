"""Console + file logging (reference: logger/logger.py:9-48)."""

from __future__ import annotations

import functools
import logging
import os
import sys


class _ColorFormatter(logging.Formatter):
    COLORS = {
        logging.DEBUG: "\x1b[36m",     # cyan
        logging.INFO: "\x1b[32m",      # green
        logging.WARNING: "\x1b[33m",   # yellow
        logging.ERROR: "\x1b[31m",     # red
        logging.CRITICAL: "\x1b[35m",  # magenta
    }
    RESET = "\x1b[0m"

    def format(self, record):
        color = self.COLORS.get(record.levelno, "")
        prefix = f"{color}[%s]{self.RESET}" % record.levelname
        base = f"{prefix} %(asctime)s %(name)s: %(message)s"
        return logging.Formatter(base, datefmt="%H:%M:%S").format(record)


@functools.lru_cache()
def create_logger(output_dir: str = "", name: str = "vm_asr_tpu") -> logging.Logger:
    """Cached colored console + per-run file logger.

    Mirrors the reference's ``create_logger`` (logger/logger.py:9): colored
    stream handler plus a plain-text ``log_rank0.txt`` in the output dir.
    """
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    sh = logging.StreamHandler(sys.stdout)
    sh.setLevel(logging.INFO)
    sh.setFormatter(_ColorFormatter())
    logger.addHandler(sh)

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "log_rank0.txt"), mode="a")
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(
            logging.Formatter("[%(levelname)s] %(asctime)s %(name)s: %(message)s")
        )
        logger.addHandler(fh)

    return logger
