"""Dataset pre-flight validator (scripts/validate_dataset.py)."""

import json
import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from validate_dataset import validate  # noqa: E402

from synfmc_tpu.data.fixture import build_synthetic_dataset  # noqa: E402


@pytest.fixture()
def params(tmp_path):
    kw = build_synthetic_dataset(str(tmp_path), num_seqs=2, num_objects=2,
                                 num_frames=48, height=64, width=96)
    kw.update(sample_n_frames=8, sample_size=(48, 64), max_objects=2,
              ori_fps=16, time_duration=3)
    return kw


def test_clean_fixture_passes(params):
    report = validate(params)
    assert report.errors == [], report.errors
    assert report.sequences == 2
    assert report.frames_checked > 0


def test_detects_missing_frames_and_masks(params):
    clip = os.path.join(params["data_root"], "Rendered_Traj_Results", "dynamic", "0")
    os.remove(os.path.join(clip, "0_0005.png"))  # hole in the frame numbering
    mask_dir = os.path.join(params["mask_root"], "Rendered_Traj_Results", "dynamic", "1")
    shutil.rmtree(os.path.join(mask_dir, "24"))  # middle-frame mask dir
    report = validate(params)
    msgs = "\n".join(report.errors)
    assert "not contiguous" in msgs or "frames <" in msgs
    assert "missing mask" in msgs


def test_detects_corrupt_png_and_bad_annotation(params):
    clip = os.path.join(params["data_root"], "Rendered_Traj_Results", "dynamic", "0")
    with open(os.path.join(clip, "0_0000.png"), "wb") as f:
        f.write(b"not a png at all")
    ann = os.path.join(params["lable_root"], "Rendered_Traj_Results", "dynamic", "1.json")
    with open(ann) as f:
        data = json.load(f)
    data["camera"] = data["camera"][:3]  # too few camera entries
    with open(ann, "w") as f:
        json.dump(data, f)
    report = validate(params)
    msgs = "\n".join(report.errors)
    assert "undecodable PNG" in msgs
    assert "camera entries" in msgs


def test_detects_unknown_asset_and_animation(params):
    with open(params["asset_json_file_path"]) as f:
        assets = json.load(f)
    assets.pop("asset0")  # CSV rows still reference it
    with open(params["asset_json_file_path"], "w") as f:
        json.dump(assets, f)
    report = validate(params)
    assert any("not in asset JSON" in e for e in report.errors)


def test_detects_too_short_clips(params):
    params["sample_n_frames"] = 10_000  # nothing can satisfy this
    report = validate(params)
    assert any("rejection loop" in e for e in report.errors)
