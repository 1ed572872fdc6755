"""Logging / tracing setup (reference src/logger.rs).

Env-filterable level (the reference's EnvFilter: TFHE_AES_LOG overrides the
default, logger.rs:7-25), idempotent test init (logger.rs:28-35), plus the
jax.profiler hooks that replace the reference's per-primitive Instant::now
timers.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

_INITIALIZED = False


def init(level: str = "INFO") -> None:
    global _INITIALIZED
    if _INITIALIZED:
        return
    level = os.environ.get("TFHE_AES_LOG", level)
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)-5s %(name)s: %(message)s")
    _INITIALIZED = True


def test_init(level: str = "DEBUG") -> None:
    init(level)


@contextlib.contextmanager
def timed(label: str, logger: logging.Logger | None = None):
    """Coarse wall-clock span (the reference's debug! timing around every
    expensive primitive, e.g. shortint_woppbs_1bit.rs:295-333)."""
    log = logger or logging.getLogger("tfhe_aes2_tpu")
    t0 = time.time()
    try:
        yield
    finally:
        log.debug("%s %.3fs", label, time.time() - t0)


@contextlib.contextmanager
def profile(logdir: str):
    """jax.profiler trace capture around a region (TPU-native replacement for
    the reference's tracing subscriber)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
