"""The reference's largest process-grid matrix — (5,2), (2,5), (5,5)
(`test/mpi.jl:464-475`) — needs 25 devices, more than the 8-device conftest
process provides; run it in a dedicated 25-virtual-device subprocess."""

import os
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow  # heavy tier: deselect with -m "not slow"


def test_mesh25_matrix():
    helper = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "mesh25_helper.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=25"
    proc = subprocess.run([sys.executable, helper], env=env,
                          capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, \
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    assert "mesh25 ALL OK" in proc.stdout
