"""Summarize a jax.profiler trace: per-op device time, grouped by kernel.

Usage: python benchmarks/trace_summary.py /tmp/trace_fused [top_n]
"""

import collections
import glob
import gzip
import json
import re
import sys


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = glob.glob(f"{root}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {root}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU / device
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in names.items()
                   if re.search(r"TPU|/device|XLA", n, re.I)}

    per_op = collections.Counter()
    per_group = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        if name.startswith(("Infeed", "Outfeed")):
            continue
        per_op[name] += dur
        group = re.sub(r"[.\d]+$", "", name.split("/")[-1])
        per_group[group] += dur
        total += dur

    print(f"total device op time: {total:.2f} ms  ({len(per_op)} distinct ops)")
    print("\n-- by group --")
    for name, ms in per_group.most_common(top_n):
        print(f"{ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name}")
    print("\n-- top ops --")
    for name, ms in per_op.most_common(top_n):
        print(f"{ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
