"""Per-stage pipeline metrics + JAX profiler hooks.

The reference instruments only its DAS models, with a thread-local
SystemMetrics struct updated by Instant::now() spans
(myzkp/src/modules/das/utils.rs:28-66).  This is the general-purpose
counterpart for the proving pipelines: a StageMetrics registry and a
``stage`` context manager that synchronizes the device (block_until_ready
on supplied arrays) so a span measures real device time, not dispatch
time.  ``trace`` wraps a block in a jax.profiler trace for xprof/
tensorboard when deep kernel-level profiling is needed.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class StageMetrics:
    """Accumulated wall-clock seconds and hit counts per named stage."""

    seconds: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    def record(self, name: str, dt: float) -> None:
        self.seconds[name] = self.seconds.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def reset(self) -> None:
        self.seconds.clear()
        self.counts.clear()

    def report(self) -> str:
        width = max((len(k) for k in self.seconds), default=0)
        lines = [
            f"{k:<{width}}  {self.seconds[k] * 1e3:10.2f} ms"
            f"  x{self.counts[k]}"
            for k in sorted(self.seconds, key=self.seconds.get, reverse=True)
        ]
        return "\n".join(lines)

    @contextlib.contextmanager
    def stage(self, name: str, *sync_arrays):
        """Time a pipeline stage.

        Any arrays passed are block_until_ready'd before the span closes,
        so asynchronous dispatch doesn't attribute device time to the
        wrong stage.
        """
        t0 = time.perf_counter()
        try:
            yield
        finally:
            for a in sync_arrays:
                jax.block_until_ready(a)
            self.record(name, time.perf_counter() - t0)


METRICS = StageMetrics()


def reset_metrics() -> None:
    METRICS.reset()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace of the enclosed block (view with xprof/TB)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
