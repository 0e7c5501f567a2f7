"""Serving daemon smoke test (scripts/serve.py): healthz + one generation."""

import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest
import yaml

pytestmark = pytest.mark.e2e

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_serve_generate(tmp_path):
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
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    port = "8777"
    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--config", str(cfg_path),
         "--port", port, "--cpu", "--video-length", "4",
         "--num-inference-steps", "2", "--turbo", "2",
         "--max-batch", "2", "--batch-window", "2.0"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        # wait for startup (model init on one CPU core)
        deadline = time.time() + 420
        health = None
        while time.time() < deadline:
            if proc.poll() is not None:
                _, err = proc.communicate()
                raise AssertionError(f"server died: {err[-2000:]}")
            try:
                with urllib.request.urlopen(base + "/healthz", timeout=5) as r:
                    health = json.loads(r.read())
                break
            except (urllib.error.URLError, ConnectionError, OSError):
                time.sleep(2)
        assert health and health["status"] == "ok", health
        assert health["sample_size"] == [64, 128]

        req = urllib.request.Request(
            base + "/generate",
            data=json.dumps({"prompt": "a red robot walks", "video_length": 4,
                             "num_inference_steps": 2, "seed": 7}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=420) as r:
            assert r.headers["Content-Type"] == "image/gif"
            data = r.read()
        assert data[:6] in (b"GIF87a", b"GIF89a"), data[:16]

        # malformed request -> JSON error, server stays alive
        bad = urllib.request.Request(base + "/generate", data=b"{}",
                                     headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "prompt" in json.loads(e.read())["error"]
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"

        # camera_txt whose pose count disagrees with video_length must be
        # rejected 400 at submit time (ADVICE r4: inside a coalesced group it
        # would 500 every innocent member), as must unparseable camera_txt
        cam2 = "2\n" + "\n".join(
            "0 64 64 32 32 0 0 " + " ".join(
                str(v) for v in [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0]
            ) for _ in range(2)
        )
        for body, frag in (
            ({"prompt": "x", "video_length": 4, "num_inference_steps": 2,
              "camera_txt": cam2}, "2 poses"),
            ({"prompt": "x", "video_length": 4, "num_inference_steps": 2,
              "camera_txt": "not a camera file"}, "bad camera_txt"),
        ):
            rq = urllib.request.Request(
                base + "/generate", data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(rq, timeout=30)
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert frag in json.loads(e.read())["error"]

        # concurrent same-shape requests coalesce into ONE batched pipeline
        # call (--max-batch 2); different seeds must yield different clips
        import threading

        gifs = {}

        def fire(seed):
            rq = urllib.request.Request(
                base + "/generate",
                data=json.dumps({"prompt": "a red robot walks",
                                 "video_length": 4, "num_inference_steps": 2,
                                 "seed": seed}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(rq, timeout=420) as r:
                gifs[seed] = r.read()

        ts = [threading.Thread(target=fire, args=(s,)) for s in (11, 12)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=420)
        assert gifs[11][:6] in (b"GIF87a", b"GIF89a")
        assert gifs[12][:6] in (b"GIF87a", b"GIF89a")
        assert gifs[11] != gifs[12], "different seeds produced identical clips"
    finally:
        proc.terminate()
        try:
            out, _ = proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate(timeout=10)
    # batched-dispatch evidence (batch-window 2s makes the concurrent
    # pair coalesce; the shape is compiled at bucket 2)
    assert "batched" in out, out[-2000:]
