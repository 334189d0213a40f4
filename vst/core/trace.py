"""Profiling / tracing hooks (SURVEY §5 tracing plan).

The reference's only instrumentation is wall-clock timers around generator
calls (``utils/sintel_eval.py:210-214``; ``obst_eval.py:524-531``). The
TPU-native replacements:

* :func:`profile_trace` — a ``jax.profiler.trace`` context writing a
  TensorBoard-loadable XPlane trace (op-level device timeline). Enabled for
  any block by wrapping it, or process-wide for bench/eval loops via the
  ``VST_PROFILE_DIR`` environment variable (empty/unset = zero overhead).
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` naming host-side
  phases so they show up on the trace timeline.
* :class:`ChainTimer` — the axon-safe wall-clock pattern: on the tunneled
  TPU platform ``block_until_ready`` can return before remote execution
  finishes, so correct timing chains each iteration on the previous output
  and ends with a scalar fetch (documented in bench.py; this class packages
  the same discipline for eval loops).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax

_ENV = "VST_PROFILE_DIR"


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None):
    """``jax.profiler.trace`` context. ``log_dir=None`` consults the
    ``VST_PROFILE_DIR`` env var; if that is also unset the context is a
    no-op, so call sites can wrap hot loops unconditionally."""
    log_dir = log_dir or os.environ.get(_ENV)
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named host-phase annotation for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class ChainTimer:
    """Per-step wall-clock timing that is honest under async dispatch.

    Usage::

        timer = ChainTimer()
        for frame in frames:
            with timer:
                out = stylize(params, frame)
                timer.sink(out)        # forces the fetch that ends the step
        timer.mean_ms

    ``sink`` fetches a scalar from the device output, so the step cannot be
    timed as mere dispatch. (`block_until_ready` alone is NOT sufficient on
    the axon tunnel — see bench.py.)
    """

    def __init__(self):
        self.times_ms = []
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def sink(self, out) -> None:
        leaves = jax.tree_util.tree_leaves(out)
        if leaves:
            float(leaves[0].ravel()[0])

    def __exit__(self, *exc):
        self.times_ms.append((time.perf_counter() - self._t0) * 1000.0)
        return False

    @property
    def mean_ms(self) -> float:
        return sum(self.times_ms) / max(len(self.times_ms), 1)
