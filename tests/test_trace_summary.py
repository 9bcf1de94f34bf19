"""tools/trace_summary.py: aggregate a trace-viewer JSON into hotspots.

Feeds a tiny synthetic trace (two steps, two categories, one transposed
op name reused across categories) and checks the category totals and
busy/span accounting.  The real traces it consumes are captured by
tools/profile_trace.py (SURVEY §5.1 profiling row).
"""
import gzip
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _write_trace(root: Path):
    d = root / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    meta = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 9, "tid": 5, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
    ]
    ops = []
    for step in range(2):
        t0 = 1000.0 * step
        mod = {"ph": "X", "pid": 3, "tid": 2, "ts": t0, "dur": 100.0,
               "name": "jit_step(1)"}
        # one conv fusion (60 us, 12 GFLOP -> 200 TF/s) + one loop fusion
        ops += [
            mod,
            {"ph": "X", "pid": 3, "tid": 1, "ts": t0, "dur": 100.0,
             "name": str(step)},
            {"ph": "X", "pid": 3, "tid": 3, "ts": t0, "dur": 60.0,
             "name": "convert_reduce_fusion.1",
             "args": {"hlo_category": "convolution fusion",
                      "model_flops": "12000000000", "bytes_accessed": "1"}},
            {"ph": "X", "pid": 3, "tid": 3, "ts": t0 + 60, "dur": 20.0,
             "name": "convert_reduce_fusion.2",
             "args": {"hlo_category": "loop fusion",
                      "model_flops": "0", "bytes_accessed": "2048"}},
            # a host-plane op that must be ignored
            {"ph": "X", "pid": 9, "tid": 5, "ts": t0, "dur": 999.0,
             "name": "host_noise"},
        ]
    blob = json.dumps({"displayTimeUnit": "ns", "metadata": {},
                       "traceEvents": meta + ops}).encode()
    with gzip.open(d / "vm.trace.json.gz", "wb") as f:
        f.write(blob)


def test_trace_summary_aggregates(tmp_path):
    _write_trace(tmp_path)
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "trace_summary.py"),
         str(tmp_path), "--json"],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    out = proc.stdout
    # last line is the machine-readable summary
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["steps"] == 2
    cats = summary["category_ms_per_step"]
    assert abs(cats["convolution fusion"] - 0.060) < 1e-6
    assert abs(cats["loop fusion"] - 0.020) < 1e-6
    # busy = 80 us/step; module = 100 us
    assert abs(summary["busy_ms"] - 0.080) < 1e-6
    assert abs(summary["module_ms"] - 0.100) < 1e-6
    # the shared base name must appear once per category in the top list
    conv_rows = [l for l in out.splitlines()
                 if "convert_reduce_fusion" in l and "convolution" in l]
    loop_rows = [l for l in out.splitlines()
                 if "convert_reduce_fusion" in l and "loop fusion" in l]
    assert len(conv_rows) == 1 and len(loop_rows) == 1
    # 12 GFLOP / 60 us = 200 TF/s must appear in the category table
    assert "200.0" in out
