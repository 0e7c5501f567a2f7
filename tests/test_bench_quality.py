"""scripts/bench_quality.py: drift quantification of the opt-in serving modes.

Tiny-model CPU run of the full script; asserts the metric semantics that
PERF.md's fidelity table relies on:
- the exact mode measured against itself is zero-drift (psnr clamped to 99),
- every cache mode produces FINITE, strict-JSON-safe numbers,
- cache drift is small relative to signal (the caches approximate, they do
  not replace, the trajectory),
- a longer cache interval never reduces drift to zero (the modes really are
  approximate — guards against a broken cache path silently running exact).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.e2e


def test_bench_quality_tiny():
    r = subprocess.run(
        [sys.executable, "scripts/bench_quality.py", "--tiny", "--steps", "8"],
        cwd=REPO, capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = {}
    for line in r.stdout.strip().splitlines():
        row = json.loads(line)  # strict JSON — no Infinity tokens
        rows[row["mode"]] = row

    assert rows["exact_ddim"]["rel_l2_vs_exact"] == 0.0
    assert rows["exact_ddim"]["psnr_latent_db"] == 99.0

    for name in ("deepcache_2", "deepcache_3", "cfg_cache_2", "cfg_cache_3",
                 "turbo_2", "turbo_3", "dpmpp_2m"):
        row = rows[name]
        assert 0.0 < row["rel_l2_vs_exact"] < 1.0, (name, row)
        assert 0.0 < row["psnr_latent_db"] < 99.0, (name, row)

    # half-step dpmpp modes (latency halving, alone + composed with turbo)
    for name in ("dpmpp_2m_4steps", "dpmpp_turbo3_4steps"):
        row = rows[name]
        assert row["steps"] == 4
        assert 0.0 < row["rel_l2_vs_exact"], (name, row)
        assert row["psnr_latent_db"] <= 99.0, (name, row)
