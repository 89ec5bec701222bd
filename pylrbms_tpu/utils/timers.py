"""Structured timers + jax profiler hooks.

The reference has only ad-hoc ``time.time()`` spans
(``linearelliptic_block_swipdg_decomp.py:67-75``); SURVEY.md §5.1 asks for a
first-class tracing subsystem.  ``Timings`` collects named spans (correctly
synchronizing jax async dispatch) and can dump a table;
``trace(dir)`` wraps ``jax.profiler.trace`` for XLA-level traces.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List


class Timings:
    def __init__(self):
        self.spans: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str, sync=None):
        """`sync` may be a jax array / pytree to block on before stopping."""
        t0 = time.perf_counter()
        out = {}
        yield out
        if sync is not None:
            import jax
            jax.block_until_ready(sync)
        if "sync" in out:
            import jax
            jax.block_until_ready(out["sync"])
        self.spans[name].append(time.perf_counter() - t0)

    def report(self) -> str:
        # median is the headline column: a single remote-service stall (the
        # axon tunnel occasionally inserts a multi-second RTT outlier) moves
        # mean/max but not the median, so steady-state economics read off
        # one run without cold/warm caveats
        lines = [f"{'span':40s} {'calls':>6s} {'total[s]':>10s} "
                 f"{'median[ms]':>11s} {'min[ms]':>10s} {'max[ms]':>10s}"]
        for name, ts in sorted(self.spans.items()):
            st = sorted(ts)
            n = len(st)
            med = (st[n // 2] if n % 2 else 0.5 * (st[n // 2 - 1]
                                                   + st[n // 2]))
            lines.append(f"{name:40s} {n:6d} {sum(ts):10.3f} "
                         f"{1e3 * med:11.2f} "
                         f"{1e3 * min(ts):10.2f} {1e3 * max(ts):10.2f}")
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps({k: {"calls": len(v), "total_s": sum(v)}
                           for k, v in self.spans.items()})


GLOBAL_TIMINGS = Timings()


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA-level profiler trace (view with tensorboard/xprof)."""
    import jax
    with jax.profiler.trace(log_dir):
        yield
