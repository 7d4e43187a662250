"""Per-stage timing + optional XLA profiler traces.

The reference only has ad-hoc wall-clock prints (SURVEY.md §5); here every
pipeline stage (decode / preprocess / encode / store / db) accumulates into a
StageTimer that reports totals and throughput, and `trace()` wraps a region
in a jax.profiler trace (view with TensorBoard or xprof) when a trace dir is
given via WISE_TRACE_DIR.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def add(self, name: str, seconds: float, count: int = 1):
        self.totals[name] += seconds
        self.counts[name] += count

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(
                    1000 * self.totals[name] / max(1, self.counts[name]), 3
                ),
            }
            for name in sorted(self.totals)
        }

    def summary(self) -> str:
        parts = [
            f"{name}={self.totals[name]:.2f}s/{self.counts[name]}x"
            for name in sorted(self.totals)
        ]
        return " ".join(parts)


@contextlib.contextmanager
def trace(label: str = "wise"):
    """jax.profiler trace if WISE_TRACE_DIR is set, else no-op."""
    trace_dir = os.environ.get("WISE_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield


def measure_roundtrip(samples: int = 5) -> float:
    """Median host<->device round-trip seconds on this backend — the
    CLAUDE.md tunnel-timing calibration primitive (block_until_ready is a
    no-op through the axon tunnel; a tiny readback is the only sync).
    Every benchmark/profile script subtracts this from its host-chained
    loop timings."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda a: a + 1)
    x = jnp.zeros((1,))
    np.asarray(f(x))
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))
