"""Structured tracing / profiling utilities.

The reference's observability is manual wall-clock prints scattered through
`loop()` (per-frame iteration time + running average,
/root/reference/src/SolveDVO.cpp:2092-2109,:2351; publish time :2252-2264).
This module makes those first-class: named stage timers with running
statistics, a device-time-aware scope (block_until_ready so TPU async
dispatch doesn't hide work), and a `jax.profiler` trace wrapper for deep
dives. "ms per frame-pair batch" is the headline metric (SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    @property
    def mean_ms(self) -> float:
        return 1000.0 * self.total_s / max(self.count, 1)


@dataclass
class Tracer:
    """Named stage timers with running averages (the reference's
    avgIterationsTime bookkeeping, SolveDVO.cpp:2107, generalized)."""

    stats: Dict[str, StageStats] = field(default_factory=lambda: defaultdict(StageStats))
    enabled: bool = True

    @contextlib.contextmanager
    def stage(self, name: str, block_on: Any = None):
        """Time a stage; pass jax arrays via `block_on` to include device
        time (async dispatch otherwise returns immediately)."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.stats[name].add(time.perf_counter() - t0)

    def timed(self, name: str):
        """Decorator version; blocks on the function's own return value."""

        def deco(fn):
            def wrapped(*a, **k):
                t0 = time.perf_counter()
                out = fn(*a, **k)
                jax.block_until_ready(out)
                self.stats[name].add(time.perf_counter() - t0)
                return out

            return wrapped

        return deco

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "count": s.count,
                "mean_ms": round(s.mean_ms, 3),
                "min_ms": round(1000 * s.min_s, 3),
                "max_ms": round(1000 * s.max_s, 3),
                "total_s": round(s.total_s, 3),
            }
            for k, s in self.stats.items()
        }

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.report(), indent=2, sort_keys=True)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a `jax.profiler` device trace (TensorBoard format) around a
    code region — the deep-dive replacement for the reference's printf
    timing."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
