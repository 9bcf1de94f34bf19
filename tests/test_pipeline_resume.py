"""run_pipeline resume-lineage resolution (tools/run_pipeline.py
follow_chain_ckpt).

A resumed chain's output directory only holds the stages it executed; a
SECOND resume pointed at it must still find earlier stages' checkpoints
by walking the recorded chain_src.txt lineage (the r4_chainC_t30 failure
mode: tune rerun init-from a prune rerun init-from the full chain).
"""

import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))

from run_pipeline import follow_chain_ckpt  # noqa: E402


def _mk_ckpt(root, name):
    d = os.path.join(root, name)
    os.makedirs(d)
    path = os.path.join(d, "latest_ckpt.msgpack")
    with open(path, "wb") as f:
        f.write(b"x")
    return path


def test_direct_hit(tmp_path):
    p = _mk_ckpt(str(tmp_path), "pipe_phase2")
    assert follow_chain_ckpt(str(tmp_path), "pipe_phase2") == p


def test_one_level_lineage(tmp_path):
    full = tmp_path / "full_chain"
    resumed = tmp_path / "prune_rerun"
    full.mkdir(), resumed.mkdir()
    p = _mk_ckpt(str(full), "pipe_phase2")
    (resumed / "chain_src.txt").write_text(str(full))
    assert follow_chain_ckpt(str(resumed), "pipe_phase2") == p


def test_two_level_lineage(tmp_path):
    full = tmp_path / "full_chain"
    prune_rerun = tmp_path / "prune_rerun"
    tune_rerun = tmp_path / "tune_rerun"
    for d in (full, prune_rerun, tune_rerun):
        d.mkdir()
    phase2 = _mk_ckpt(str(full), "pipe_phase2")
    prune = _mk_ckpt(str(prune_rerun), "pipe_prune")
    (prune_rerun / "chain_src.txt").write_text(str(full))
    (tune_rerun / "chain_src.txt").write_text(str(prune_rerun))
    # prune ckpt comes from the middle run, phase2 from the base chain
    assert follow_chain_ckpt(str(tune_rerun), "pipe_prune") == prune
    assert follow_chain_ckpt(str(tune_rerun), "pipe_phase2") == phase2


def test_dead_end_reports_first_choice(tmp_path):
    resumed = tmp_path / "resumed"
    resumed.mkdir()
    want = os.path.join(str(resumed), "pipe_phase2", "latest_ckpt.msgpack")
    assert follow_chain_ckpt(str(resumed), "pipe_phase2") == want


def test_cycle_terminates(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    (a / "chain_src.txt").write_text(str(b))
    (b / "chain_src.txt").write_text(str(a))
    want = os.path.join(str(a), "pipe_phase2", "latest_ckpt.msgpack")
    assert follow_chain_ckpt(str(a), "pipe_phase2") == want
