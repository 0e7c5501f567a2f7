"""The driver-facing entry points must work exactly as the driver calls them.

Round 1 shipped with ``dryrun_multichip`` red because it assumed the live
backend already had n devices; the driver invokes it under a 1-chip TPU
platform.  These tests pin the contract: the function must succeed no matter
what backend the calling process has.
"""

import os
import subprocess
import sys
import pytest

pytestmark = pytest.mark.e2e

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_reexecs_when_devices_short():
    # Simulate the driver: a process whose backend has only ONE device calls
    # dryrun_multichip(8).  It must re-exec onto a virtual 8-device CPU mesh
    # and exit 0 (MULTICHIP_r01.json regression).
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # -> 1 CPU device in the outer process
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
