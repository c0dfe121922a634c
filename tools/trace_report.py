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


def op_durations(trace: dict, long: bool = False):
    """Total duration (us) per event name across complete ('X') events.

    With `long`, also collect each op's HLO `long_name` (the full
    instruction with operand shapes, recorded by the TPU profiler) and
    `bytes_accessed` — this is how tail fusions are attributed to source
    without fusion-ID-matching a separately compiled module."""
    agg = collections.Counter()
    meta = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            agg[name] += e["dur"]
            if long and name not in meta:
                a = e.get("args", {})
                if "long_name" in a:
                    meta[name] = (
                        a.get("bytes_accessed", "?"), a["long_name"]
                    )
    return agg, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=1,
                    help="divide totals by this step count")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--long", action="store_true",
                    help="print each op's HLO long_name + bytes accessed")
    ap.add_argument("--chars", type=int, default=240,
                    help="long_name truncation width")
    args = ap.parse_args()

    agg, meta = op_durations(load_latest_trace(args.trace_dir), args.long)
    print(f"{'ms/step':>10}  op")
    for name, us in agg.most_common(args.top):
        # Python-side profiler frames start with '$'; usually noise.
        if name.startswith("$"):
            continue
        print(f"{us / args.steps / 1000:10.3f}  {name[:120]}")
        if args.long and name in meta:
            nbytes, lname = meta[name]
            print(f"{'':10}  [{nbytes} B] {lname[:args.chars]}")


if __name__ == "__main__":
    main()
