#!/usr/bin/env python
"""Evaluation CLI: camera-pose accuracy (RotErr/TransErr) and frame PSNR.

Consumes the artifacts the trainers' validation writes under
``samples/{step}/`` (computed + GT camera label txts, gifs) — the same
hooks the reference leaves for its paper metrics (save_camera_info_to_txt_file,
train_cam_ctrl.py:41-74, 779).

  # all label-txt pairs under a validation step dir
  python scripts/evaluate.py --samples-dir output/run/samples/200

  # one explicit pair
  python scripts/evaluate.py --pred cam_label_compute_0.txt --gt cam_label_gt_0.txt

  # per-frame PSNR between two gifs/videos (e.g. ours vs reference render)
  python scripts/evaluate.py --video-a ours.gif --video-b reference.gif

Prints one JSON object.
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def eval_label_pair(pred, gt):
    from synfmc_tpu.evaluation.metrics import camera_errors_from_label_txt

    errs = camera_errors_from_label_txt(pred, gt)
    return {k: (np.asarray(v).round(6).tolist() if isinstance(v, np.ndarray) else v)
            for k, v in errs.items()}


def eval_samples_dir(d):
    out = {}
    for pred in sorted(glob.glob(os.path.join(d, "cam_label_compute_*.txt"))):
        m = re.search(r"cam_label_compute_(\d+)\.txt$", pred)
        gt = os.path.join(d, f"cam_label_gt_{m.group(1)}.txt")
        if os.path.exists(gt):
            out[f"sample_{m.group(1)}"] = eval_label_pair(pred, gt)
    if not out:
        return {"error": f"no cam_label_compute_*/cam_label_gt_* pairs in {d}"}
    rot = [v["rot_err_deg_mean"] for v in out.values()]
    trans = [v["trans_err_mean"] for v in out.values()]
    out["aggregate"] = {
        "rot_err_deg_mean": float(np.mean(rot)),
        "trans_err_mean": float(np.mean(trans)),
        "num_samples": len(rot),
    }
    return out


def eval_videos(path_a, path_b):
    import imageio.v2 as imageio

    from synfmc_tpu.evaluation.metrics import psnr

    a = np.stack([np.asarray(f) for f in imageio.mimread(path_a)]).astype(np.float32) / 255.0
    b = np.stack([np.asarray(f) for f in imageio.mimread(path_b)]).astype(np.float32) / 255.0
    n = min(len(a), len(b))
    if a.shape[1:] != b.shape[1:]:
        return {"error": f"frame shapes differ: {a.shape[1:]} vs {b.shape[1:]}"}
    # psnr() is +inf for identical frames; json.dumps would emit the
    # non-standard token Infinity which strict parsers (jq) reject — clamp
    # to a finite cap (exact match is the case this CLI certifies).
    per_frame = [min(psnr(a[i], b[i]), 99.0) for i in range(n)]
    return {
        "psnr_per_frame": [round(p, 3) for p in per_frame],
        "psnr_mean": float(np.mean(per_frame)),
        "frames_compared": n,
    }


def _video_files(path):
    """A video file, or a directory of gifs/mp4s (sorted)."""
    if os.path.isdir(path):
        files = sorted(
            f for ext in ("*.gif", "*.mp4") for f in glob.glob(os.path.join(path, ext))
        )
        if not files:
            raise FileNotFoundError(f"no .gif/.mp4 files in {path}")
        return files
    return [path]


def _load_frames(path):
    """(T, H, W, 3) float32 in [0, 1]."""
    import imageio.v2 as imageio

    frames = np.stack([np.asarray(f)[..., :3] for f in imageio.mimread(path)])
    return frames.astype(np.float32) / 255.0


def eval_frechet_extracted(path_a, path_b, extractor_path, video_level=False):
    """The FULL FID/FVD seam: decode videos -> TorchScript feature extractor
    -> Fréchet distance (no precomputed features needed).

    - FID protocol (default): every FRAME is a sample; the extractor gets
      (N, 3, H, W) float in [0, 1] and must return (N, D).  The standard
      artifact is the InceptionV3 pool3 TorchScript export (D=2048).
    - FVD protocol (``video_level=True``): every VIDEO is a sample; the
      extractor gets (1, 3, T, H, W) per clip and must return (1, D).  The
      standard artifact is the I3D Kinetics-400 logits export (D=400);
      needs >= 2 videos per side (pass directories).
    """
    from synfmc_tpu.evaluation.fid import (
        extract_features,
        fid_from_features,
        load_torchscript_extractor,
    )

    extractor = load_torchscript_extractor(extractor_path)

    def features(path):
        batches = []
        for f in _video_files(path):
            frames = _load_frames(f)
            if video_level:
                batches.append(frames.transpose(3, 0, 1, 2)[None])  # (1,3,T,H,W)
            else:
                batches.append(frames.transpose(0, 3, 1, 2))  # (T,3,H,W)
        return extract_features(batches, extractor)

    fa, fb = features(path_a), features(path_b)
    return {
        "frechet_distance": fid_from_features(fa, fb),
        "protocol": "fvd" if video_level else "fid",
        "n_a": int(len(fa)),
        "n_b": int(len(fb)),
        "dim": int(fa.shape[-1]),
        "extractor": os.path.basename(extractor_path),
    }


def _load_features(path):
    data = np.load(path)
    if hasattr(data, "files"):  # npz: take 'features' or the sole array
        key = "features" if "features" in data.files else data.files[0]
        data = data[key]
    return np.asarray(data)


def eval_frechet(path_a, path_b):
    """FID/FVD from precomputed feature arrays (.npy or .npz['features']).

    Features come from the standard extractors (InceptionV3 pool3 -> FID,
    I3D logits -> FVD; see synfmc_tpu.evaluation.fid.load_torchscript_extractor
    for running one) — the Fréchet math itself is extractor-agnostic.
    """
    from synfmc_tpu.evaluation.fid import fid_from_features

    a, b = _load_features(path_a), _load_features(path_b)
    return {
        "frechet_distance": fid_from_features(a, b),
        "n_a": int(len(a)),
        "n_b": int(len(b)),
        "dim": int(a.shape[-1]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples-dir", default=None, help="a samples/{step} validation dir")
    p.add_argument("--pred", default=None, help="computed camera label txt")
    p.add_argument("--gt", default=None, help="ground-truth camera label txt")
    p.add_argument("--video-a", default=None)
    p.add_argument("--video-b", default=None)
    p.add_argument("--features-a", default=None,
                   help="feature .npy/.npz for FID/FVD (with --features-b)")
    p.add_argument("--features-b", default=None)
    p.add_argument("--extractor", default=None,
                   help="TorchScript feature extractor (.pt): with --video-a/"
                        "--video-b (files or gif dirs) runs the full FID/FVD "
                        "path — InceptionV3 pool3 for FID, I3D for FVD")
    p.add_argument("--fvd", action="store_true",
                   help="video-level (FVD) protocol: one feature per clip, "
                        "extractor input (1, 3, T, H, W)")
    args = p.parse_args()

    result = {}
    if args.samples_dir:
        result["camera"] = eval_samples_dir(args.samples_dir)
    if args.pred and args.gt:
        result["camera_pair"] = eval_label_pair(args.pred, args.gt)
    if args.video_a and args.video_b:
        if args.extractor:
            result["frechet"] = eval_frechet_extracted(
                args.video_a, args.video_b, args.extractor, video_level=args.fvd
            )
        else:
            result["video"] = eval_videos(args.video_a, args.video_b)
    if args.features_a and args.features_b:
        result["frechet"] = eval_frechet(args.features_a, args.features_b)
    if not result:
        p.error("nothing to evaluate: pass --samples-dir, --pred/--gt, "
                "--video-a/--video-b, or --features-a/--features-b")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
