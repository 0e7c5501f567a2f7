"""Video/gif artifact writers (reference fmc/utils/util.py:36-48
``save_videos_grid``, fps=8) and the camera-pose txt dumps used for
RotErr/TransErr evaluation (train_cam_ctrl.py:41-74)."""

from __future__ import annotations

import os

import numpy as np


def _to_uint8(video: np.ndarray) -> np.ndarray:
    v = np.asarray(video)
    if v.dtype != np.uint8:
        v = (np.clip(v, 0.0, 1.0) * 255).astype(np.uint8)
    return v


def save_videos_grid(videos: np.ndarray, path: str, n_rows: int = 4, fps: int = 8) -> None:
    """Save (B, F, H, W, 3) videos as an animated gif grid."""
    import imageio

    videos = _to_uint8(videos)
    b, f, h, w, c = videos.shape
    n_rows = min(n_rows, b)
    n_cols = (b + n_rows - 1) // n_rows
    frames = []
    for t in range(f):
        grid = np.zeros((n_rows * h, n_cols * w, c), dtype=np.uint8)
        for i in range(b):
            r, col = i % n_rows, i // n_rows
            grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = videos[i, t]
        frames.append(grid)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.mimsave(path, frames, fps=fps, loop=0)


def save_image_grid(images: np.ndarray, path: str, n_rows: int = 4) -> None:
    """Save (B, H, W, 3) images as a png grid."""
    import imageio

    images = _to_uint8(images)
    b, h, w, c = images.shape
    n_rows = min(n_rows, b)
    n_cols = (b + n_rows - 1) // n_rows
    grid = np.zeros((n_rows * h, n_cols * w, c), dtype=np.uint8)
    for i in range(b):
        r, col = i % n_rows, i // n_rows
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, grid)


def save_camera_info_txt(path: str, intrinsics: np.ndarray, cam_rts: np.ndarray) -> None:
    """Per-sample camera label dump for RotErr/TransErr evaluation.

    Layout parity with reference ``save_camera_info_to_txt_file``
    (train_cam_ctrl.py:41-74): one line per frame —
    ``frame_idx fx fy cx cy 0 0 r00 r01 r02 t0 r10 r11 r12 t1 r20 r21 r22 t2``.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cam_rts = np.asarray(cam_rts).reshape(len(cam_rts), -1)
    with open(path, "w") as f:
        f.write(f"{len(cam_rts)}\n")
        for i, (k, rt) in enumerate(zip(np.asarray(intrinsics), cam_rts)):
            vals = [i] + list(k[:4]) + [0, 0] + list(rt[:12])
            f.write(" ".join(str(float(v)) if j else str(int(v)) for j, v in enumerate(vals)) + "\n")


def save_camera_label_txt(path: str, header: str, cams: np.ndarray) -> None:
    """Reference-layout camera label file (train_cam_ctrl.py:50-74):
    a header line, then per frame seven ``-1`` placeholder fields followed
    by the row-major 3x4 camera matrix.  Written for both the computed
    (``labels``) and ground-truth (``gt labels``) trajectories so RotErr/
    TransErr can be evaluated downstream."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cams = np.asarray(cams, dtype=np.float64).reshape(len(cams), 12)
    with open(path, "w") as f:
        f.write(header + " \n")
        for cam in cams:
            f.write("-1 -1 -1 -1 -1 -1 -1 " + " ".join(str(v) for v in cam) + "\n")
