"""AOT serving export (scripts/export_serving.py): the serialized artifact
must deserialize and reproduce the live-traced program exactly."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.e2e

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_export_roundtrip_and_verify(tmp_path):
    out = str(tmp_path / "fmc_serve.bin")
    r = subprocess.run(
        [sys.executable, "scripts/export_serving.py", "--tiny", "--cpu",
         "--out", out, "--verify", "--deepcache", "2",
         # full opt-in serving stack rides the export: turbo caches + dpmpp
         "--cfg-cache", "2", "--solver", "dpmpp_2m"],
        cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    body = json.loads(r.stdout.strip().splitlines()[-1])
    assert body["verify_ok"], body
    assert body["verify_max_err"] < 1e-4
    assert os.path.getsize(out) == body["bytes"] > 1000
    assert body["deepcache_interval"] == 2
    assert body["solver"] == "dpmpp_2m" and body["cfg_cache_interval"] == 2
