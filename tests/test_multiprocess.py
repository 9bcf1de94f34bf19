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
