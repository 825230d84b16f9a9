"""Tracing/profiling helpers.

The reference's observability is ad-hoc ``time.time()`` prints
(SURVEY.md §5); here: phase timers with device sync, a context manager for
XLA profiler traces, and a simple aggregated report.
"""

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulates wall time per named phase (synchronizing the device)."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                import jax

                if result is not None:
                    jax.block_until_ready(result)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self):
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": self.totals[name] / self.counts[name] * 1000,
            }
            for name in self.totals
        }

    def __str__(self):
        lines = [
            f"{name:30s} {v['mean_ms']:8.2f} ms x{v['count']}"
            for name, v in sorted(self.report().items())
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/flashgmm_trace"):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator adding a named TraceAnnotation around a function."""
    import jax

    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapped

    return deco
