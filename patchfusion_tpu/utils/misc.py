"""Misc runtime utilities (reference estimator/utils/misc.py + runner.py):
seed fixing, environment logging, the RunnerInfo attribute bag."""

from __future__ import annotations

import logging
import os
import random
import sys
import numpy as np


class RunnerInfo:
    """Dynamic attribute bag threaded through train/test tools (reference
    estimator/utils/runner.py:3-22)."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)


def fix_random_seed(seed: int) -> None:
    """Seed every host RNG in play (reference misc.py:16-26; JAX device RNG
    is explicit via PRNG keys, so host RNGs are the only ambient state)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def log_env(logger: logging.Logger) -> None:
    """Log the runtime environment (reference misc.py:28-54)."""
    import jax
    logger.info("python: %s", sys.version.replace("\n", ""))
    logger.info("jax: %s", jax.__version__)
    logger.info("devices: %s", jax.devices())
    logger.info("process_index: %d / %d", jax.process_index(),
                jax.process_count())


def setup_logger(name: str = "patchfusion_tpu",
                 log_file: str = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
