"""The native PJRT serving binaries must keep building from source.

The compiled binaries are deliberately NOT committed (ADVICE r2 —
build artifacts go stale); this guards the C++ against bit-rot.
Runtime behavior needs a real PJRT plugin + chip and was verified on
the v5e (serving/README.md); compilation needs only the bundled
PJRT C API headers.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SERVING = os.path.join(REPO, "serving")


@pytest.mark.slow
def test_serving_binaries_build():
    proc = subprocess.run(["make", "-B", "-C", SERVING],
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-1500:] + proc.stderr[-1500:]
    for name in ("pjrt_runner", "pjrt_server"):
        path = os.path.join(SERVING, name)
        assert os.path.exists(path) and os.access(path, os.X_OK), name
