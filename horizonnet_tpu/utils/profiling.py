"""Per-stage timing + jax.profiler trace hooks.

The reference has no profiling story (SURVEY.md §5: a lone time.time print).
Since the north star is panos/sec, every pipeline stage here can be timed
and traced: ``stage_timer`` accumulates wall-clock per named stage and
``trace_annotation`` scopes a jax.profiler TraceAnnotation so stages show
up in TPU traces.
"""

import contextlib
import time
from collections import defaultdict


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self):
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t:.3f}s total, {t/n*1000:.1f} ms/call "
                         f"({n} calls)")
        return "\n".join(lines)


stage_timer = StageTimer()


@contextlib.contextmanager
def trace_annotation(name):
    try:
        import jax.profiler
        with jax.profiler.TraceAnnotation(name):
            yield
    except ImportError:
        yield
