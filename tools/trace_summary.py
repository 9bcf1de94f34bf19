#!/usr/bin/env python
"""Summarize a jax.profiler device trace into an op/category hotspot table.

Consumes the trace-viewer JSON (`vm.trace.json.gz`) that
`tools/profile_trace.py` captures (the xplane.pb twin needs TF's proto
bindings, which this image lacks; the JSON carries the same per-op
device events with `hlo_category`, `model_flops` and `bytes_accessed`).

This is the analysis half of the SURVEY §5.1 profiling story (the
reference eyeballs its timing through trainer meters + nvprof; here the
device plane is real TPU data): per-HLO-category time shares, top ops,
MXU-utilization estimate per category from the compiler's own flop
counts, and the device-busy vs step-wall split that exposes tunnel /
host dispatch gaps.

Usage:
  python tools/trace_summary.py outputs/trace_train [--top 25]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_trace(root):
    pats = [
        os.path.join(root, "plugins/profile/*/*.trace.json.gz"),
        os.path.join(root, "*.trace.json.gz"),
    ]
    for pat in pats:
        hits = sorted(glob.glob(pat))
        if hits:
            with gzip.open(hits[-1]) as f:
                return json.load(f), hits[-1]
    raise SystemExit(f"no *.trace.json.gz under {root}")


def device_planes(events):
    """Map pid -> process name; tid names per (pid, tid)."""
    pname, tname = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pname[e["pid"]] = e["args"]["name"]
        elif e.get("name") == "thread_name":
            tname[(e["pid"], e.get("tid"))] = e["args"]["name"]
    return pname, tname


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--json", action="store_true",
                    help="emit one machine-readable JSON line at the end")
    args = ap.parse_args()

    data, path = load_trace(args.trace_dir)
    events = data["traceEvents"]
    pname, tname = device_planes(events)
    dev_pids = {p for p, n in pname.items() if "TPU" in n or "device" in n.lower()}
    if not dev_pids:
        raise SystemExit(f"no device plane in {path}; planes: {pname}")

    # Per-step numbers must be normalized per DEVICE plane: on a
    # multi-chip trace every device runs the module once per step, so
    # counting "XLA Modules" events across all planes would divide
    # ms/step by steps x devices (ADVICE r4).  Restrict the whole
    # summary to ONE device plane (the busiest keeps single-chip traces
    # unchanged) and report how many planes were dropped.
    if len(dev_pids) > 1:
        by_plane = collections.Counter()
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in dev_pids:
                by_plane[e["pid"]] += e.get("dur", 0)
        keep = by_plane.most_common(1)[0][0]
        print(f"# NOTE: {len(dev_pids)} device planes in trace — "
              f"summarizing plane {keep} ({pname.get(keep)}) only")
        dev_pids = {keep}

    ops, steps, mods = [], [], []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        lane = tname.get((e["pid"], e.get("tid")), "")
        if lane == "XLA Ops":
            ops.append(e)
        elif lane == "Steps":
            steps.append(e)
        elif lane == "XLA Modules":
            mods.append(e)

    n_steps = max(1, len(mods) or len(steps))
    mod_ms = sum(m.get("dur", 0) for m in mods) / 1e3
    # step wall = span from first to last device event (includes gaps)
    ts0 = min(e["ts"] for e in ops) if ops else 0.0
    ts1 = max(e["ts"] + e.get("dur", 0) for e in ops) if ops else 0.0
    span_ms = (ts1 - ts0) / 1e3
    busy_ms = sum(e.get("dur", 0) for e in ops) / 1e3

    by_cat = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # ms, flops, bytes, n
    by_op = collections.Counter()
    for e in ops:
        a = e.get("args", {})
        cat = a.get("hlo_category", "?")
        dur = e.get("dur", 0)
        row = by_cat[cat]
        row[0] += dur / 1e3
        row[1] += float(a.get("model_flops", 0) or 0)
        row[2] += float(a.get("bytes_accessed", 0) or 0)
        row[3] += 1
        # strip trailing .<id> so repeated instances of one op aggregate;
        # key by (base, category) — one base name (e.g. convert_reduce_fusion)
        # can land in several HLO categories
        name = e["name"]
        base = name.rsplit(".", 1)[0] if name.rsplit(".", 1)[-1].isdigit() else name
        by_op[(base, cat)] += dur

    print(f"# {path}")
    print(f"# modules: {len(mods)} x {mod_ms / max(1, len(mods)):.2f} ms device time"
          f" | device busy {busy_ms:.2f} ms / span {span_ms:.2f} ms"
          f" ({100 * busy_ms / span_ms if span_ms else 0:.1f}% busy;"
          f" gaps = host/dispatch/transfer)")
    print(f"\n{'category':<34}{'ms/step':>9}{'share':>8}{'TF/s':>8}{'GB/s':>9}{'#ops':>7}")
    tot_ms = sum(r[0] for r in by_cat.values())
    for cat, (ms, fl, by, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        ms_step = ms / n_steps
        tfs = (fl / n_steps) / (ms_step / 1e3) / 1e12 if ms_step else 0.0
        gbs = (by / n_steps) / (ms_step / 1e3) / 1e9 if ms_step else 0.0
        print(f"{cat:<34}{ms_step:>9.3f}{ms / tot_ms:>7.1%}{tfs:>8.1f}{gbs:>9.1f}{n // n_steps:>7}")

    print(f"\ntop {args.top} ops (aggregated over instance ids):")
    for (name, cat), us in by_op.most_common(args.top):
        print(f"  {us / 1e3 / n_steps:8.3f} ms/step  {cat:<28} {name[:60]}")

    if args.json:
        cats = {c: round(r[0] / n_steps, 4) for c, r in by_cat.items()}
        print(json.dumps({
            "trace": path, "steps": n_steps,
            "module_ms": round(mod_ms / max(1, len(mods)), 3),
            "busy_ms": round(busy_ms / n_steps, 3),
            "span_ms": round(span_ms, 3),
            "category_ms_per_step": cats,
        }))


if __name__ == "__main__":
    sys.exit(main())
