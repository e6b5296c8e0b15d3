"""Logging setup.

Parity with reference ``src/utils/logger.py:13-63``: one file handler under
``./log/<model>-<dataset>-<time>.log`` plus a stream handler; level derived
from ``config['state']``.
"""

from __future__ import annotations

import logging
import os

from genmmrec_tpu.utils.misc import get_local_time


def init_logger(config) -> None:
    log_root = "./log/"
    os.makedirs(log_root, exist_ok=True)
    model_name = config["model"] or "model"
    dataset_name = config["dataset"] or "dataset"
    logfilepath = f"{model_name}-{dataset_name}-{get_local_time()}.log"
    logfilepath = os.path.join(log_root, logfilepath)

    filefmt = "%(asctime)-15s %(levelname)s %(message)s"
    filedatefmt = "%a %d %b %Y %H:%M:%S"
    sfmt = "%(asctime)-15s %(levelname)s %(message)s"
    sdatefmt = "%d %b %H:%M"

    state = (config["state"] or "info").lower()
    level = {
        "info": logging.INFO,
        "debug": logging.DEBUG,
        "error": logging.ERROR,
        "warning": logging.WARNING,
        "critical": logging.CRITICAL,
    }.get(state, logging.INFO)

    fh = logging.FileHandler(logfilepath, "w", "utf-8")
    fh.setLevel(level)
    fh.setFormatter(logging.Formatter(filefmt, filedatefmt))

    sh = logging.StreamHandler()
    sh.setLevel(level)
    sh.setFormatter(logging.Formatter(sfmt, sdatefmt))

    root = logging.getLogger()
    # idempotent across grid-search runs in one process
    for h in list(root.handlers):
        root.removeHandler(h)
    root.setLevel(level)
    root.addHandler(fh)
    root.addHandler(sh)
