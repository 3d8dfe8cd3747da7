"""Profiling / observability helpers (SURVEY.md §5: the reference has no
tracing at all — tqdm bars only; here the north-star metric is
images/sec/chip so step timing + XLA profiler hooks are first-class).

- `trace(logdir)`: context manager around jax.profiler traces (view in
  TensorBoard / xprof);
- `StepTimer`: wall-clock + throughput accounting for trainer loops;
- `annotate`: named trace spans inside host code.
"""
import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace of the enclosed block (no-op when logdir falsy)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation


class StepTimer:
    """Accumulates wall time + sample counts -> images/sec."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._images = 0
        self._steps = 0

    def tick(self, n_images: int):
        self._images += int(n_images)
        self._steps += 1

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def images_per_sec(self) -> float:
        el = self.elapsed
        return self._images / el if el > 0 else 0.0

    @property
    def steps_per_sec(self) -> float:
        el = self.elapsed
        return self._steps / el if el > 0 else 0.0
