"""Tracing, profiling, and throughput accounting.

The reference has no profiling at all (SURVEY §5: ad-hoc ``time``
imports used only for ``time.sleep``). Here:

- :func:`annotate` / :class:`annotated` — ``jax.profiler`` trace
  annotations around pipeline stages (visible in TensorBoard/XProf
  traces captured with :func:`trace`).
- :class:`Timer` — ``block_until_ready``-based wall timing for
  microbenchmarks (correct under JAX async dispatch).
- :class:`ThroughputMeter` — the scans/sec/chip first-class counter
  (the BASELINE.json north-star metric).
- :class:`MetricsLogger` — structured JSONL metrics sink replacing the
  reference's prints (and its imported-but-never-used TensorBoard,
  data_preparation.py:11).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Callable, Iterator, Optional

import jax


def annotate(name: str):
    """Decorator: wrap a function in a named profiler trace span."""

    def deco(fn: Callable) -> Callable:
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped

    return deco


@contextlib.contextmanager
def annotated(name: str) -> Iterator[None]:
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timing that respects async dispatch: call ``stop`` with
    the computation's outputs; they are blocked on before reading the
    clock."""

    def __init__(self):
        self.start_time: Optional[float] = None
        self.elapsed: float = 0.0

    def start(self) -> "Timer":
        self.start_time = time.perf_counter()
        return self

    def stop(self, *outputs) -> float:
        for out in outputs:
            jax.block_until_ready(out)
        self.elapsed = time.perf_counter() - self.start_time
        return self.elapsed

    @contextlib.contextmanager
    def measure(self, *dummy) -> Iterator["Timer"]:
        self.start()
        yield self


class ThroughputMeter:
    """scans/sec accounting over a sliding window."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events: list = []
        self.total_scans = 0

    def record(self, n_scans: int, *outputs) -> None:
        for out in outputs:
            jax.block_until_ready(out)
        self._events.append((time.perf_counter(), n_scans))
        self.total_scans += n_scans
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def scans_per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        n = sum(e[1] for e in self._events[1:])
        return n / dt if dt > 0 else 0.0


class MetricsLogger:
    """Append-only JSONL metrics log (+ optional TensorBoard scalars)."""

    def __init__(self, path: str, tensorboard_dir: Optional[str] = None):
        self.path = path
        self._f = open(path, "a")
        self._tb = None
        if tensorboard_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"step": int(step)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step" and isinstance(v, float):
                    self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
