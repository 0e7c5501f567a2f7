"""Generation CLI smoke test with tiny model overrides."""

import os
import subprocess
import sys

import yaml
import pytest

pytestmark = pytest.mark.e2e


def test_generate_cli(tmp_path):
    cfg = {
        "output_dir": str(tmp_path),
        "mixed_precision_training": False,
        "model_overrides": {
            "block_out_channels": [32, 64, 128, 128],
            "cross_attention_dim": 32,
            "attn_heads": 4,
            "vae_channels": [32, 32, 32, 32],
            "text": {"vocab_size": 49408, "hidden_size": 32, "num_layers": 1, "num_heads": 2},
        },
        "unet_additional_kwargs": {
            "use_motion_module": True,
            "motion_module_kwargs": {"num_attention_heads": 4},
        },
        "pose_encoder_kwargs": {"temporal_attention_nhead": 4},
        "train_data": {"params": {"sample_size": [64, 128], "sample_n_frames": 4}},
        "noise_scheduler_kwargs": {"beta_schedule": "linear"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "video.gif"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [
            sys.executable, "scripts/generate.py", "--config", str(cfg_path),
            "--prompt", "a red robot walks", "--video-length", "4",
            "--num-inference-steps", "2", "--out", str(out), "--cpu",
        ],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists()
