"""Profiling annotations — the NVTX analog on TPU.

TPU counterpart of the reference's NVTX range plumbing (reference:
pytorch/utils.py:787 nvtx_range_push / :805 nvtx_range_pop, gated by
NVTE_NVTX_ENABLED; common/nvtx.h). On TPU, ``jax.named_scope`` tags the
HLO so ranges appear in XProf/TensorBoard traces; ``jax.profiler``
start/stop wraps trace capture. Enabled via TE_TPU_PROFILE=1.
"""
from __future__ import annotations

import contextlib
import functools
import os
from typing import Optional

import jax


def profiling_enabled() -> bool:
    return os.environ.get("TE_TPU_PROFILE", "0") == "1"


@contextlib.contextmanager
def nvtx_range(name: str):
    """Named scope visible in XProf (reference: nvtx_range_push/pop)."""
    if profiling_enabled():
        with jax.named_scope(name):
            yield
    else:
        yield


def nvtx_decorator(name: Optional[str] = None):
    def deco(fn):
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapped(*a, **kw):
            with nvtx_range(label):
                return fn(*a, **kw)
        return wrapped
    return deco


def start_trace(logdir: str = "/tmp/te_tpu_trace"):
    """Begin an XProf trace (reference analog: Nsight capture around the
    benchmark scripts)."""
    jax.profiler.start_trace(logdir)
    return logdir


def stop_trace():
    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace(logdir: str = "/tmp/te_tpu_trace"):
    start_trace(logdir)
    try:
        yield logdir
    finally:
        stop_trace()
