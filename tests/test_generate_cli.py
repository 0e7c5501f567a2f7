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
            # beyond-reference solver flag rides the smoke test (the other
            # CLI tests cover the default ddim path)
            "--solver", "dpmpp_2m",
        ],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists()


def test_generate_cli_omc_trajectory(tmp_path):
    """--omcm-ckpt + --obj-traj-npz: object-conditioned generation through
    the CLI (stage-3 inference surface)."""
    import numpy as np

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

    # tiny omcm bundle via the training writer
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from synfmc_tpu.models.adapter import ObjectAdapter
    from synfmc_tpu.training import checkpoint as ckpt

    adapter = ObjectAdapter(channels=(32, 64, 128, 128))
    av = adapter.init(jax.random.PRNGKey(0), jnp.zeros((4, 64, 128, 13)), jnp.zeros((4, 64, 128, 1)))
    ckpt.save_stage3_bundles(str(tmp_path), 0, av["params"])

    f, o, h, w = 4, 2, 64, 128
    rng = np.random.default_rng(0)
    masks = np.zeros((f, o, h, w), np.float32)
    masks[:, 0, 16:32, 40:80] = 1.0
    masks[:, 1, 40:56, 10:40] = 1.0
    np.savez(tmp_path / "traj.npz",
             obj_info=rng.normal(size=(f, o, 12)).astype(np.float32),
             obj_masks=masks)

    out = tmp_path / "video_omc.gif"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [
            sys.executable, "scripts/generate.py", "--config", str(cfg_path),
            "--prompt", "a red robot walks", "--video-length", "4",
            "--num-inference-steps", "2",
            "--omcm-ckpt", str(tmp_path / "omcm-step-0.ckpt"),
            "--obj-traj-npz", str(tmp_path / "traj.npz"),
            "--out", str(out), "--cpu", "--allow-untrained-cm",
        ],
        capture_output=True, text=True, env=env, cwd=repo, timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists()

    # without the explicit opt-out, stage-3 inference with no trained CMC
    # checkpoint must fail fast (train_cam_obj_ctrl.py:280 parity)
    res = subprocess.run(
        [
            sys.executable, "scripts/generate.py", "--config", str(cfg_path),
            "--prompt", "a red robot walks", "--video-length", "4",
            "--num-inference-steps", "2",
            "--omcm-ckpt", str(tmp_path / "omcm-step-0.ckpt"),
            "--obj-traj-npz", str(tmp_path / "traj.npz"),
            "--out", str(out), "--cpu",
        ],
        capture_output=True, text=True, env=env, cwd=repo, timeout=560,
    )
    assert res.returncode != 0
    assert "CMC" in res.stderr or "pretrained_cm_path" in res.stderr

def test_generate_cli_frame_parallel(tmp_path):
    """--frame-parallel S drives sequence-parallel serving end-to-end through
    the CLI on an 8-virtual-device CPU mesh ({data:2, sp:4} for one prompt)."""
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
    out = tmp_path / "video_sp.gif"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip()
    res = subprocess.run(
        [
            sys.executable, "scripts/generate.py", "--config", str(cfg_path),
            "--prompt", "a red robot walks", "--video-length", "4",
            "--num-inference-steps", "2", "--frame-parallel", "4",
            "--out", str(out), "--cpu",
        ],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists()
