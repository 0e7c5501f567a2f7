"""scripts/parity.py must run end-to-end with fake torch checkpoints so the
real-weight parity run (PSNR>=35 north star, BASELINE.md) is code-complete
before the weights exist (VERDICT r1 missing #5)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fakeckpt"))
    r = subprocess.run(
        [sys.executable, "scripts/parity.py", "--make-fake", root, "--tiny", "--cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return root


def _run_parity(fake_root, extra=()):
    cmd = [
        sys.executable, "scripts/parity.py",
        "--sd15", f"{fake_root}/sd15",
        "--motion-module", f"{fake_root}/mm.ckpt",
        "--lora-ckpt", f"{fake_root}/lora.ckpt",
        "--cm-ckpt", f"{fake_root}/cmcm.ckpt",
        "--omcm-ckpt", f"{fake_root}/omcm.ckpt",
        "--tiny", "--cpu", *extra,
    ]
    return subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, timeout=540)


def test_parity_roundtrip_lossless(fake_root):
    r = _run_parity(fake_root)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "PARITY PASS" in r.stdout
    body = json.loads(r.stdout[: r.stdout.rindex("}") + 1])
    for name, rep in body["roundtrip"].items():
        assert rep["max_abs_err"] == 0.0, (name, rep)
        assert rep["unmatched"] == 0, (name, rep)
        assert rep["tensors"] > 0, (name, rep)
    assert body["denoise_forward"]["finite"]


def test_parity_activation_compare(fake_root, tmp_path):
    # record "reference" activations with our own model (stand-in for the
    # torch recording) -> the comparison path must report PSNR above the bar
    rec = tmp_path / "acts.npz"
    np.savez(
        rec,
        latents=np.random.default_rng(0).normal(size=(1, 4, 8, 16, 4)).astype(np.float32),
        timesteps=np.array([500]),
        input_ids=np.zeros((1, 77), np.int64),
        eps=np.zeros((1, 4, 8, 16, 4), np.float32),  # placeholder, overwritten below
    )
    # first run computes ours; reuse it as the recorded eps for a self-match
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from scripts.parity import _build  # noqa: E402

    class A:  # minimal arg shim for _build
        tiny, lora_rank, height, width, frames = True, 2, 64, 128, 4

    import jax.numpy as jnp

    cfg, models, params = _build(A)
    # fill params exactly as parity.py does (same load order)
    from synfmc_tpu.interop.sd_loader import load_sd15
    from synfmc_tpu.training import checkpoint as ckpt

    params = load_sd15(params, f"{fake_root}/sd15")
    mm = ckpt.torch_load_state_dict(f"{fake_root}/mm.ckpt")["state_dict"]
    params["unet"] = ckpt.load_into_params(params["unet"], mm, "unet")
    lora = ckpt.torch_load_state_dict(f"{fake_root}/lora.ckpt")["lora_state_dict"]
    params["unet"] = ckpt.load_into_params(params["unet"], lora, "unet")
    bundle = ckpt.torch_load_state_dict(f"{fake_root}/cmcm.ckpt")
    params["pose_encoder"] = ckpt.load_into_params(
        params["pose_encoder"], bundle["pose_encoder_state_dict"], "pose_encoder")
    params["unet"] = ckpt.load_into_params(
        params["unet"], bundle["attention_processor_state_dict"], "unet")

    data = dict(np.load(rec))
    ctx = models["text"].apply({"params": params["text"]}, jnp.asarray(data["input_ids"], jnp.int32))
    ours = models["unet"].apply(
        {"params": params["unet"]}, jnp.asarray(data["latents"]),
        jnp.asarray(data["timesteps"], jnp.int32), ctx,
    )
    data["eps"] = np.asarray(ours)
    np.savez(rec, **data)

    r = _run_parity(fake_root, extra=["--activations", str(rec)])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    body = json.loads(r.stdout[: r.stdout.rindex("}") + 1])
    assert body["activations"]["eps_psnr"] >= 35.0, body["activations"]
