"""scripts/parity.py must run end-to-end with fake torch checkpoints so the
real-weight parity run (PSNR>=35 north star, BASELINE.md) is code-complete
before the weights exist (VERDICT r1 missing #5).

One subprocess runs the whole harness (--self-test): write fake reference
bundles, perturb every param, load the bundles back (loaders must restore the
exact values), roundtrip-export diff, denoise forward, and an activation
comparison against a self-recorded torch-layout npz.  Both tests assert on
that single run's JSON (the harness is tracing-heavy; one process instead of
three keeps the suite fast).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.e2e

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def selftest(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fakeckpt"))
    r = subprocess.run(
        [sys.executable, "scripts/parity.py", "--self-test", root, "--tiny", "--cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "PARITY PASS" in r.stdout
    return json.loads(r.stdout[r.stdout.index("{") : r.stdout.rindex("}") + 1])


def test_parity_roundtrip_lossless(selftest):
    # params were overwritten with a constant before loading, so zero error
    # proves the loaders restored every exported tensor exactly
    assert selftest["roundtrip"], "no bundles compared"
    for name, rep in selftest["roundtrip"].items():
        assert rep["max_abs_err"] == 0.0, (name, rep)
        assert rep["unmatched"] == 0, (name, rep)
        assert rep["tensors"] > 0, (name, rep)
    assert selftest["denoise_forward"]["finite"]


def test_parity_activation_compare(selftest):
    # torch-layout (B,C,F,h,w) npz recorded and compared through the real
    # --activations path; the self-match must clear the PSNR bar
    assert selftest["activations"]["eps_psnr"] >= 35.0, selftest["activations"]


def test_recorder_schema_validation():
    """scripts/record_reference_acts.py's npz writer enforces the schema
    parity.py consumes — bad recordings fail on the reference side, not
    after shipping the npz to the TPU side."""
    import numpy as np

    from scripts.record_reference_acts import write_activation_npz

    b, f, hl, wl = 1, 4, 8, 16
    lat = np.zeros((b, 4, f, hl, wl), np.float32)
    ok = write_activation_npz(
        "/tmp/_rec_schema_ok.npz", lat, np.array([500]),
        np.zeros((b, 77), np.int32), lat,
        plucker=np.zeros((b, 6, f, hl * 8, wl * 8), np.float32),
    )
    rec = np.load(ok)
    assert set(rec.files) == {"latents", "timesteps", "input_ids", "eps", "plucker"}

    with pytest.raises(ValueError, match="eps shape"):
        write_activation_npz("/tmp/_rec_bad.npz", lat, np.array([500]),
                             np.zeros((b, 77), np.int32), lat[:, :3])
    with pytest.raises(ValueError, match="timesteps"):
        write_activation_npz("/tmp/_rec_bad.npz", lat, np.array([500, 1]),
                             np.zeros((b, 77), np.int32), lat)
