"""2-process jax.distributed correctness: the DCN detection gather and the
cross-host barrier actually run with process_count > 1
(VERDICT r1 item 7; ref yolox/utils/dist.py:186-265)."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step_parity():
    """One full DP train step under jax.distributed (2 procs x 4 devices)
    must match the single-process 8-device mesh bit-for-bit-ish: same
    loss, same updated params (VERDICT r2 item 7; ref launch.py:38-131)."""
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multiproc_worker.py")
    coordinator = f"localhost:{_free_port()}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid), "--train"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=os.path.dirname(here), env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert all(o["ok"] for o in outs)
    # both processes observed the identical replicated result
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    assert outs[0]["param_checksum"] == pytest.approx(
        outs[1]["param_checksum"], rel=1e-6)

    # single-process oracle on this process's own 8-device mesh
    import multiproc_worker as mw
    from cocodet_tpu.parallel import make_mesh, replicate, shard_batch

    state, step, imgs, labels = mw.make_tiny_training()
    mesh = make_mesh()
    state = replicate(mesh, state)
    g_imgs, g_labels = shard_batch(mesh, (imgs, labels))
    new_state, metrics = step(state, g_imgs, g_labels)
    assert float(metrics["loss"]) == pytest.approx(outs[0]["loss"],
                                                   rel=1e-5)
    assert mw.checksum(new_state.params) == pytest.approx(
        outs[0]["param_checksum"], rel=1e-5)


@pytest.mark.slow
def test_two_process_allgather():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multiproc_worker.py")
    coordinator = f"localhost:{_free_port()}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=os.path.dirname(here), env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert all(o["ok"] for o in outs)
    assert {o["n_gathered"] for o in outs} == {3}


@pytest.mark.slow
def test_four_process_train_step_parity():
    """4 procs x 2 devices: the same global 8-device DP step as the
    2-process test, at double the process fan-out (VERDICT r3 stretch:
    multi-process coverage beyond 2; ref launch.py:38-131)."""
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multiproc_worker.py")
    coordinator = f"localhost:{_free_port()}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "4", str(pid), "--train"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=os.path.dirname(here), env=env, text=True)
        for pid in range(4)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert all(o["ok"] for o in outs)
    losses = {round(o["loss"], 5) for o in outs}
    assert len(losses) == 1, outs

    # single-process oracle (same recipe as the 2-proc test)
    import multiproc_worker as mw
    from cocodet_tpu.parallel import make_mesh, replicate, shard_batch

    state, step, imgs, labels = mw.make_tiny_training()
    mesh = make_mesh()
    state = replicate(mesh, state)
    g_imgs, g_labels = shard_batch(mesh, (imgs, labels))
    new_state, metrics = step(state, g_imgs, g_labels)
    assert float(metrics["loss"]) == pytest.approx(outs[0]["loss"],
                                                   rel=1e-5)
    assert mw.checksum(new_state.params) == pytest.approx(
        outs[0]["param_checksum"], rel=1e-5)


@pytest.mark.slow
def test_two_process_2d_mesh_parity():
    """Process-spanning 2-D (data x space) training mesh: 2 procs x 4
    devices -> global (4 data x 2 space) mesh, one train step, identical
    replicated result on both processes AND matching the single-process
    2-D oracle (VERDICT r3 stretch; parallel/mesh.py make_mesh_2d)."""
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multiproc_worker.py")
    coordinator = f"localhost:{_free_port()}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid),
             "--train2d"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=os.path.dirname(here), env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert all(o["ok"] for o in outs)
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)

    # single-process 2-D oracle
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax

    import multiproc_worker as mw
    from cocodet_tpu.parallel import replicate
    from cocodet_tpu.parallel.mesh import (DATA_AXIS, SPACE_AXIS,
                                           make_mesh_2d)

    state, step, imgs, labels = mw.make_tiny_training(size=128,
                                                      name="yolox")
    mesh = make_mesh_2d(2)
    state = replicate(mesh, state)
    g_imgs = jax.device_put(
        imgs, NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None)))
    g_labels = jax.device_put(
        labels, NamedSharding(mesh, P(DATA_AXIS, None, None)))
    new_state, metrics = step(state, g_imgs, g_labels)
    # f32 grads differ at reduction-order level between shardings (the
    # ROADMAP BN-chaos finding) — loss parity at loose tolerance is the
    # right check here; bit-level 2-D parity is pinned by the f64 slow
    # test (tests/spatial_parity_f64.py).
    assert float(metrics["loss"]) == pytest.approx(outs[0]["loss"],
                                                   rel=1e-3)
