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
    # 10 modes x a fresh pipeline-variant compile each: cold on the 1-core
    # box the TRUE cpu path (the script honors JAX_PLATFORMS now) runs
    # ~17 min; warm (.jax_cache_cpu) it is minutes.  900 s only fit while
    # the subprocess silently ran on the TPU chip.
    r = subprocess.run(
        [sys.executable, "scripts/bench_quality.py", "--tiny", "--steps", "8"],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
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
        # cache modes: nonzero, finite drift.  With RANDOM-INIT weights the
        # epsilon field has no temporal coherence for the caches to exploit,
        # so the most aggressive interval (cfg_cache_3) drifts right around
        # rel_l2 ~1.0 — bound it loosely; the solver swap at equal steps
        # (dpmpp_2m) must stay well inside the signal.
        hi = 1.0 if name == "dpmpp_2m" else 2.0
        assert 0.0 < row["rel_l2_vs_exact"] < hi, (name, row)
        assert 0.0 < row["psnr_latent_db"] < 99.0, (name, row)

    # half-step dpmpp modes (latency halving, alone + composed with turbo)
    for name in ("dpmpp_2m_4steps", "dpmpp_turbo3_4steps"):
        row = rows[name]
        assert row["steps"] == 4
        assert 0.0 < row["rel_l2_vs_exact"], (name, row)
        assert row["psnr_latent_db"] <= 99.0, (name, row)
