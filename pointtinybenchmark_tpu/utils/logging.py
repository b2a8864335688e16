"""Root logger + environment collection.

Parity target: reference TOV_mmdetection/mmdet/utils/logger.py (get_root_logger)
and mmdet/utils/collect_env.py — rebuilt for the JAX/TPU stack.
"""
from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOGGER_NAME = "ptb_tpu"
_initialized = False


def get_root_logger(log_file: Optional[str] = None, log_level: int = logging.INFO) -> logging.Logger:
    global _initialized
    logger = logging.getLogger(_LOGGER_NAME)
    if _initialized:
        return logger
    logger.setLevel(log_level)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file, "w")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    _initialized = True
    return logger


def collect_env() -> dict:
    import platform

    import jax
    import numpy as np

    from ..version import __version__

    env = {
        "sys.platform": sys.platform,
        "Python": sys.version.replace("\n", ""),
        "platform": platform.platform(),
        "jax": jax.__version__,
        "numpy": np.__version__,
        "ptb_tpu": __version__,
        "jax.devices": str(jax.devices()),
        "default_backend": jax.default_backend(),
    }
    try:
        import flax
        env["flax"] = flax.__version__
    except ImportError:
        pass
    try:
        import optax
        env["optax"] = optax.__version__
    except ImportError:
        pass
    return env
