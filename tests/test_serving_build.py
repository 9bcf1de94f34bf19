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


@pytest.mark.slow
def test_runner_detector_selftest(tmp_path):
    """The runner's standalone-detector stages (PPM read, BGR swap, native
    letterbox, box rescale to original coords, draw, PPM write) run
    end-to-end without a PJRT plugin via --selftest.  The PJRT execute
    path itself is run-verified on the v5e (serving/README.md)."""
    import numpy as np

    subprocess.run(["make", "-C", SERVING, "pjrt_runner"], check=True,
                   capture_output=True, timeout=900)
    rs = np.random.RandomState(0)
    img = (rs.rand(48, 64, 3) * 255).astype(np.uint8)
    in_ppm = tmp_path / "in.ppm"
    out_ppm = tmp_path / "out.ppm"
    in_ppm.write_bytes(b"P6\n64 48\n255\n" + img.tobytes())
    proc = subprocess.run(
        [os.path.join(SERVING, "pjrt_runner"), "--selftest", str(in_ppm),
         str(out_ppm)], capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "det cls=17" in proc.stdout and "selftest ok" in proc.stdout
    raw = out_ppm.read_bytes()
    assert raw.startswith(b"P6")
    data = raw.split(b"255\n", 1)[1]
    arr = np.frombuffer(data, np.uint8).reshape(48, 64, 3)
    # boxes drawn onto the ORIGINAL image: some but not all pixels changed
    changed = int((arr != img).any(axis=-1).sum())
    assert 0 < changed < 48 * 64
