"""Tracing / profiling / numerics-debug helpers (SURVEY.md §5.1-5.2 gap-fill).

The reference has no profiler (vestigial pynvml imports only) and relies on
Lightning's detect_anomaly. Here:

- ``trace(dir)``: jax.profiler trace context (view in TensorBoard / xprof).
- ``StepTimer``: steady-state steps/sec + voices/sec with warmup skip.
- ``enable_nan_debugging()``: jax_debug_nans — the detect_anomaly equivalent that
  raises on the first NaN-producing op instead of at the loss.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging() -> None:
    """Raise on the first NaN/Inf produced inside jitted code (reruns the offending
    computation un-jitted to locate it) — detect_anomaly, the JAX way."""
    jax.config.update("jax_debug_nans", True)


class StepTimer:
    def __init__(self, warmup_steps: int = 2, batch_size: int = 1):
        self.warmup_steps = warmup_steps
        self.batch_size = batch_size
        self._count = 0
        self._t0: Optional[float] = None

    def tick(self) -> None:
        self._count += 1
        if self._count == self.warmup_steps:
            self._t0 = time.time()

    @property
    def steps_per_sec(self) -> float:
        measured = self._count - self.warmup_steps
        if self._t0 is None or measured <= 0:
            return 0.0
        return measured / max(time.time() - self._t0, 1e-9)

    @property
    def voices_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size
