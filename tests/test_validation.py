"""Validation rendering + sanity dump + artifact tests (tiny models)."""

import glob
import os

import numpy as np
import pytest

from synfmc_tpu.config import load_config
from synfmc_tpu.data.fixture import build_synthetic_dataset
from synfmc_tpu.training.trainers import train
from tests.test_trainers import TINY_OVERRIDES, _config


@pytest.fixture(scope="module")
def fixture_kwargs(tmp_path_factory):
    root = tmp_path_factory.mktemp("synfmc_val")
    return build_synthetic_dataset(str(root), num_seqs=2, num_objects=2, num_frames=48)


def test_cam_training_with_validation_and_sanity(fixture_kwargs, tmp_path):
    cfg = _config("cam", fixture_kwargs, tmp_path)
    cfg["enable_validation"] = True
    cfg["validation_steps_tuple"] = [1]
    cfg["validation_data"]["num_inference_steps"] = 2
    cfg["validation_data"]["num"] = 1
    cfg["do_sanity_check"] = True
    metrics = train("cam", cfg, max_steps_override=2)
    run_dir = metrics["run_dir"]
    assert os.path.exists(os.path.join(run_dir, "sanity_check", "batch.gif"))
    gifs = glob.glob(os.path.join(run_dir, "samples", "*", "validation.gif"))
    assert gifs, "no validation gif rendered"
    txts = glob.glob(os.path.join(run_dir, "samples", "*", "*-camera.txt"))
    assert txts, "no camera label txt dumped"
    from synfmc_tpu.evaluation.metrics import parse_camera_txt

    intr, rts = parse_camera_txt(txts[0])
    assert rts.shape[1:] == (3, 4)
