"""Structured logging + profiling hooks for the Python encode plane.

Mirrors the C++ daemon logger (native/daemon/log.{h,cpp}): timestamped,
leveled, component-tagged lines on stderr, level from AV1TPU_LOG_LEVEL.
``profile_trace`` wraps a code region in a JAX profiler trace when
AV1TPU_PROFILE=<dir> is set (view with TensorBoard / xprof) — the
tracing/profiling subsystem the reference lacks entirely (SURVEY §5).
"""

from __future__ import annotations

import contextlib
import logging
import os
import sys

_CONFIGURED = False


def get_logger(component: str) -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        level = os.environ.get("AV1TPU_LOG_LEVEL", "info").upper()
        if level == "WARN":
            level = "WARNING"
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(
            "%(asctime)s.%(msecs)03dZ %(levelname)-5s [%(name)s] %(message)s",
            datefmt="%Y-%m-%dT%H:%M:%S"))
        root = logging.getLogger("av1tpu")
        root.addHandler(handler)
        root.setLevel(getattr(logging, level, logging.INFO))
        root.propagate = False
        _CONFIGURED = True
    return logging.getLogger(f"av1tpu.{component}")


@contextlib.contextmanager
def profile_trace(label: str = "encode"):
    """JAX profiler trace when AV1TPU_PROFILE=<dir> is set; no-op otherwise."""
    trace_dir = os.environ.get("AV1TPU_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    get_logger("profile").info("capturing JAX trace '%s' to %s", label,
                               trace_dir)
    with jax.profiler.trace(trace_dir):
        yield
