"""Summarize a jax.profiler perfetto trace: device time per XLA module and
per op, with HLO long_name snippets for the heavy ops.

The tunnel-safe attribution method (NOTES.md): wall clocks over the axon
tunnel mix dispatch latency into everything; the device trace is ground
truth for where step/frame time actually goes.

Usage: python scripts/trace_report.py /tmp/prof_settled [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import os


def load_trace(trace_dir: str) -> dict:
    cands = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
        + glob.glob(os.path.join(trace_dir, "**", "trace.json.gz"),
                    recursive=True))
    if not cands:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(cands[-1]) as f:
        return json.load(f)


def report(trace_dir: str, top: int = 25):
    tr = load_trace(trace_dir)
    ev = tr["traceEvents"]
    rows = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            rows[(e["pid"], e["tid"])] = e["args"].get("name", "")

    mod_tot = collections.Counter()
    op_tot = collections.Counter()
    op_name = {}
    dev_total = 0.0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        row = rows.get((e["pid"], e["tid"]), "")
        if "Module" in row:
            mod_tot[e["name"]] += e["dur"]
        elif "XLA Ops" in row:
            dev_total += e["dur"]
            op_tot[e["name"]] += e["dur"]
            ln = e.get("args", {}).get("long_name")
            if ln and e["name"] not in op_name:
                op_name[e["name"]] = ln

    print(f"device op time total: {dev_total / 1e3:.1f} ms")
    print("\n-- modules --")
    for name, d in mod_tot.most_common(top):
        print(f"{d / 1e3:9.1f} ms  {name[:70]}")
    print(f"\n-- top {top} ops --")
    for name, d in op_tot.most_common(top):
        ln = op_name.get(name, "")[:110].replace("\n", " ")
        print(f"{d / 1e3:9.1f} ms {100 * d / max(dev_total, 1):5.1f}%  "
              f"{name[:28]:28s} {ln}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    report(args.trace_dir, args.top)
