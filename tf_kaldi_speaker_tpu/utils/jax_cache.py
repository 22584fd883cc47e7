"""Persistent XLA compilation cache.

Through the axon remote-compile tunnel a single train-step compile can take
tens of seconds, and each length bucket is its own shape. The persistent
cache makes those one-time costs per MACHINE instead of per process: set
``TFKS_COMPILE_CACHE`` (or pass a path) and every Trainer/Extractor enables
it. Safe to call repeatedly.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger("tfks.jax_cache")

_enabled = False


def enable_persistent_cache(path: Optional[str] = None) -> bool:
    global _enabled
    if _enabled:
        return True
    path = path or os.environ.get("TFKS_COMPILE_CACHE")
    if not path:
        return False
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
        log.info("Persistent compilation cache at %s", path)
        return True
    except Exception as e:  # pragma: no cover
        log.warning("Could not enable compilation cache: %s", e)
        return False
