"""Aggregate device-op durations from a jax.profiler trace.

Works from the perfetto `trace.json.gz` the profiler writes (plain JSON —
no tensorflow/xplane deps), summing track-event durations on the device
threads grouped by a coarse op category. Used by scripts/profile_*.py.
"""

import collections
import glob
import gzip
import json
import os
import re

_CATEGORIES = (
    ("conv", re.compile(r"conv|dot", re.I)),
    ("reduce", re.compile(r"reduce|norm", re.I)),
    ("gather/scatter", re.compile(r"gather|scatter|dynamic-?slice|"
                                  r"dynamic-?update", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("rng", re.compile(r"rng|threefry", re.I)),
    ("fusion/elementwise", re.compile(r"fusion|add|multiply|select|convert",
                                      re.I)),
)


def _categorize(name: str) -> str:
    for cat, rx in _CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def load_perfetto(trace_dir: str):
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no perfetto trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        return json.load(f)


def summarize_trace(trace_dir: str, steps: int = 1, top: int = 25):
    """Print per-op-name totals (top N) and category totals from the
    device-side complete events ("ph" == "X")."""
    data = load_perfetto(trace_dir)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    # device tracks: process names containing "TPU"/"Device" (host python
    # threads are excluded so only XLA op execution is counted)
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    def on_device(e):
        pn = pid_name.get(e.get("pid"), "")
        tn = tid_name.get((e.get("pid"), e.get("tid")), "")
        s = (pn + " " + tn).lower()
        return ("tpu" in s or "device" in s or "/device" in s or
                "xla ops" in s or "steps" in s.lower()) and \
            "host" not in s

    by_name = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not on_device(e):
            continue
        name = e.get("name", "?")
        if name.lower() in ("steps", "step"):
            continue
        dur = float(e["dur"])  # microseconds
        by_name[name] += dur
        by_cat[_categorize(name)] += dur
        total += dur

    print(f"\n== device op totals over {steps} steps "
          f"({total / steps / 1e3:.2f} ms/step) ==")
    for cat, us in by_cat.most_common():
        print(f"  {cat:<22} {us / steps / 1e3:8.3f} ms/step "
              f"({100 * us / max(total, 1e-9):5.1f}%)")
    print(f"\n== top {top} ops ==")
    for name, us in by_name.most_common(top):
        print(f"  {us / steps / 1e3:8.3f} ms/step  {name[:110]}")
    return by_cat, by_name, total
