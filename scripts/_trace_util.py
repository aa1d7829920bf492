"""Shared trace-analysis helpers for the perf scripts: load the newest
device trace under a directory and aggregate TensorCore op durations by
name (one table row per HLO op)."""

import glob
import gzip
import json
from collections import defaultdict


def load_device_ops(tdir):
    """Returns {op_name: [total_us, count]} over the newest trace file
    under tdir, restricted to device (TensorCore) tracks."""
    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {tdir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e.get("pid"): e.get("args", {}).get("name", "")
            for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    core = {p for p, n in pids.items()
            if "TensorCore" in n or "/device:" in n or "Chip" in n}
    agg = defaultdict(lambda: [0.0, 0])
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in core:
            continue
        name = e.get("name", "")
        if not name or name.startswith("Steps"):
            continue
        agg[name][0] += e.get("dur", 0.0)
        agg[name][1] += 1
    return agg


def print_table(agg, divisor, n_rows=60, per="call"):
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"{'us/' + per:>10} {'count':>6}  name")
    for name, (dur, cnt) in rows[:n_rows]:
        print(f"{dur / divisor:10.1f} {cnt:6d}  {name[:110]}")
