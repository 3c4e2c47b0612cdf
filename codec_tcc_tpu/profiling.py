"""Tracing / profiling hooks.

The reference has no profiling at all — its only timing-adjacent artifacts
are progress prints (``/root/reference/src/codec.py:806,827,837``; SURVEY §5
"tracing/profiling: absent"). This module provides:

* ``stage(name)``        — context manager combining ``jax.named_scope`` (so
  the stage shows up in XLA/TensorBoard traces) with wall-clock capture;
* ``Profiler``           — accumulates per-stage wall times and emits a
  structured report;
* ``trace_to(dir)``      — wraps ``jax.profiler.trace`` for on-demand
  TensorBoard/Perfetto capture (the CLI exposes ``--profile-dir``).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

from .utils.logging import get_logger

logger = get_logger("profiling")


class Profiler:
    def __init__(self) -> None:
        self.wall: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        import jax

        t0 = time.perf_counter()
        with jax.named_scope(name):
            yield
        dt = time.perf_counter() - t0
        self.wall[name] += dt
        self.calls[name] += 1

    def reset(self) -> None:
        self.wall.clear()
        self.calls.clear()

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "wall_s": self.wall[name],
                "calls": self.calls[name],
                "mean_ms": 1e3 * self.wall[name] / max(1, self.calls[name]),
            }
            for name in sorted(self.wall)
        }

    def log_report(self) -> None:
        for name, row in self.report().items():
            logger.info(
                "%-24s %8.1f ms total  %5d calls  %8.2f ms/call",
                name, 1e3 * row["wall_s"], int(row["calls"]), row["mean_ms"],
            )


_global_profiler: Optional[Profiler] = None


def get_profiler() -> Profiler:
    global _global_profiler
    if _global_profiler is None:
        _global_profiler = Profiler()
    return _global_profiler


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    with get_profiler().stage(name):
        yield


@contextlib.contextmanager
def trace_to(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA trace viewable in TensorBoard/Perfetto."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        yield
    logger.info("profile trace written to %s", profile_dir)
