"""Op-level timing report from a jax.profiler trace.

Parses the chrome trace (trace.json.gz) that jax.profiler writes — no
TensorBoard needed — and prints per-op-name total durations. This is how the
44.5 ms train-step composition in docs/DESIGN.md was measured.

Usage:
    # capture
    with jax.profiler.trace("/tmp/mytrace"):
        for _ in range(N): step(...)
    # report
    python tools/trace_report.py /tmp/mytrace --steps N
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import glob
import gzip
import json
import os


def load_latest_trace(trace_dir: str) -> dict:
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
    )
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as f:
        return json.load(f)


def op_durations(trace: dict) -> collections.Counter:
    """Total duration (us) per event name across complete ('X') events."""
    agg = collections.Counter()
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            agg[e.get("name", "?")] += e["dur"]
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=1,
                    help="divide totals by this step count")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    agg = op_durations(load_latest_trace(args.trace_dir))
    print(f"{'ms/step':>10}  op")
    for name, us in agg.most_common(args.top):
        # Python-side profiler frames start with '$'; usually noise.
        if name.startswith("$"):
            continue
        print(f"{us / args.steps / 1000:10.3f}  {name[:120]}")


if __name__ == "__main__":
    main()
