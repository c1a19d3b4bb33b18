"""Structured metrics + profiling (SURVEY.md §5.1/§5.5 build targets).

The reference only has prints/AverageMeters/matplotlib PNGs; this is the
framework-grade replacement: a JSONL metrics writer every driver logs
through, and a jax.profiler trace context behind a flag for TPU traces.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Optional


class MetricsWriter:
    """Append-only JSONL metrics stream + in-memory curves."""

    def __init__(self, save_dir: str, name: str = "metrics"):
        os.makedirs(save_dir, exist_ok=True)
        self.path = os.path.join(save_dir, f"{name}.jsonl")
        self._f = open(self.path, "a")
        self.curves: dict = {}
        self._t0 = time.time()

    def log(self, step: int, **values):
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in values.items():
            v = float(v)
            rec[k] = v
            self.curves.setdefault(k, []).append(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()

    def dump_curves(self, prefix: str = "train"):
        """Loss/accuracy curve artifacts (reference dumps matplotlib PNGs,
        unlearn/impl.py:12-18; we always write JSON + PNG when available)."""
        base = os.path.splitext(self.path)[0]
        with open(f"{base}_{prefix}_curves.json", "w") as f:
            json.dump(self.curves, f)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for k, ys in self.curves.items():
                plt.plot(ys, label=k)
            plt.legend()
            plt.savefig(f"{base}_{prefix}.png")
            plt.close()
        except Exception:
            pass


@contextmanager
def maybe_profile(trace_dir: Optional[str] = None):
    """jax.profiler trace when a dir is given (or SALUN_TRACE_DIR is set)."""
    import jax

    trace_dir = trace_dir or os.environ.get("SALUN_TRACE_DIR")
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def step_timer(meter_list: list):
    t0 = time.perf_counter()
    yield
    meter_list.append(time.perf_counter() - t0)
