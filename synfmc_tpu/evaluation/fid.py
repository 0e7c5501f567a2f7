"""Fréchet distance metrics: FID (images) and FVD (videos).

The SynFMC paper (ICCV 2025) reports FID/FVD as its generation-quality
metrics; the reference repo ships no implementation (SURVEY.md §6 — the
paper holds the numbers).  This module provides the exact Fréchet
distance math plus a pluggable feature-extractor seam, so a user can
compute the paper's metrics by supplying the standard extractor weights
(InceptionV3 pool3 for FID, I3D logits for FVD — neither ships in this
offline environment, hence the seam rather than bundled weights).

    d^2 = |mu1 - mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))

The trace term uses the eigenvalues of S1 @ S2 (similar to the symmetric
sqrt product, so the eigenvalues are real-nonnegative up to noise): no
scipy dependency, numerically matched to the reference implementations'
sqrtm to ~1e-6 for well-conditioned inputs.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np


def compute_statistics(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D); rows = samples)."""
    f = np.asarray(features, np.float64)
    assert f.ndim == 2 and len(f) >= 2, f"need (N>=2, D) features, got {f.shape}"
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Squared Fréchet distance between two Gaussians (the FID/FVD score)."""
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    diff = mu1 - mu2

    prod = sigma1 @ sigma2
    # regularize like the standard implementations do when sqrtm struggles
    if not np.isfinite(prod).all():
        raise ValueError("non-finite covariance product")
    eigvals = np.linalg.eigvals(prod)
    # S1 S2 is similar to a PSD symmetric product: eigenvalues are real
    # nonnegative up to floating-point noise — clip the noise
    tr_sqrt = float(np.sqrt(np.clip(eigvals.real, 0.0, None)).sum())
    if np.abs(eigvals.imag).max(initial=0.0) > eps * max(1.0, np.abs(eigvals.real).max(initial=0.0)):
        # fall back with diagonal loading for ill-conditioned inputs
        off = eps * np.eye(sigma1.shape[0])
        eigvals = np.linalg.eigvals((sigma1 + off) @ (sigma2 + off))
        tr_sqrt = float(np.sqrt(np.clip(eigvals.real, 0.0, None)).sum())

    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_sqrt)


def fid_from_features(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FID between two (N, D) feature sets (InceptionV3 pool3 for images)."""
    return frechet_distance(*compute_statistics(feats_a), *compute_statistics(feats_b))


def fvd_from_features(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FVD between two (N, D) video-level feature sets (I3D logits,
    400-d, per the standard FVD protocol) — same Fréchet math as FID."""
    return fid_from_features(feats_a, feats_b)


def extract_features(
    batches: Iterable[np.ndarray],
    extractor: Callable[[np.ndarray], np.ndarray],
) -> np.ndarray:
    """Run ``extractor`` over batches and stack (N, D) features."""
    feats = [np.asarray(extractor(b)) for b in batches]
    out = np.concatenate([f.reshape(len(f), -1) for f in feats], axis=0)
    return out


def load_torchscript_extractor(path: str, device: str = "cpu"):
    """Wrap a user-supplied TorchScript feature extractor (e.g. the standard
    FID InceptionV3 or FVD I3D exports) as a numpy->numpy callable.

    Weights are not bundled (offline environment); any TorchScript module
    mapping a (N, ...) float tensor to (N, D) features works.
    """
    import torch

    model = torch.jit.load(path, map_location=device).eval()

    def run(batch: np.ndarray) -> np.ndarray:
        with torch.no_grad():
            out = model(torch.from_numpy(np.ascontiguousarray(batch)).to(device))
        return out.cpu().numpy()

    return run
