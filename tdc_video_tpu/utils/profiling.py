"""Tracing / profiling utilities.

The reference ships no tracing at all (SURVEY.md section 5: only
CUDA_LAUNCH_BLOCKING debug flags).  Here profiling is first-class:

* `trace(logdir)` — context manager around jax.profiler for XLA/TPU traces
  viewable in TensorBoard or Perfetto;
* `StageTimer` — lightweight named wall/device timers for pipeline stages
  (decode / encode / compress / prefill / decode-loop) with JSON export;
* `annotate(name)` — TraceAnnotation passthrough so stages show up inside
  device traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, host_profile: bool = False):
    """Capture an XLA device trace: `with trace("/tmp/trace"): step()`."""
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside device traces."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating wall-clock timers keyed by stage name.

    `block=True` stages call jax.block_until_ready on the value returned by
    the body so device time is attributed to the right stage.
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        with annotate(name):
            yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def timed(self, name: str, fn, *args, block: bool = True, **kw):
        t0 = time.perf_counter()
        with annotate(name):
            out = fn(*args, **kw)
            if block:
                out = jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def summary(self) -> Dict[str, dict]:
        return {
            k: {
                "total_s": round(v, 4),
                "count": self.counts[k],
                "mean_ms": round(v / max(self.counts[k], 1) * 1e3, 3),
            }
            for k, v in sorted(self.totals.items())
        }

    def dump(self, path: str):
        with open(path, "w") as fh:
            json.dump(self.summary(), fh, indent=2)
