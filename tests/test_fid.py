"""Fréchet distance (FID/FVD) math against closed forms."""

import numpy as np
import pytest

from synfmc_tpu.evaluation.fid import (
    compute_statistics,
    extract_features,
    fid_from_features,
    frechet_distance,
    fvd_from_features,
)


def test_identical_gaussians_are_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 16))
    mu, sigma = compute_statistics(f)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8
    assert abs(fid_from_features(f, f.copy())) < 1e-8


def test_mean_shift_closed_form():
    # N(0, I) vs N(m, I): d^2 = |m|^2 exactly
    d = 8
    mu1, mu2 = np.zeros(d), np.full(d, 0.5)
    eye = np.eye(d)
    got = frechet_distance(mu1, eye, mu2, eye)
    assert abs(got - d * 0.25) < 1e-9


def test_diagonal_covariance_closed_form():
    # diagonal S1, S2: Tr(S1 + S2 - 2 sqrt(S1 S2)) = sum (sqrt(a_i)-sqrt(b_i))^2
    a = np.array([1.0, 4.0, 9.0])
    b = np.array([4.0, 1.0, 16.0])
    want = float(((np.sqrt(a) - np.sqrt(b)) ** 2).sum())
    got = frechet_distance(np.zeros(3), np.diag(a), np.zeros(3), np.diag(b))
    assert abs(got - want) < 1e-9


def test_sampled_gaussians_converge():
    rng = np.random.default_rng(1)
    n, d = 4000, 4
    shift = np.array([1.0, 0.0, -1.0, 0.5])
    fa = rng.normal(size=(n, d))
    fb = rng.normal(size=(n, d)) + shift
    got = fid_from_features(fa, fb)
    want = float(shift @ shift)
    assert abs(got - want) < 0.05  # sampling noise at n=4000
    # symmetric
    assert abs(got - fid_from_features(fb, fa)) < 1e-6


def test_nonsymmetric_but_valid_covariances():
    # correlated Gaussians: must be finite, nonnegative, near-zero for same dist
    rng = np.random.default_rng(2)
    A = rng.normal(size=(6, 6))
    cov = A @ A.T + 0.1 * np.eye(6)
    fa = rng.multivariate_normal(np.zeros(6), cov, size=3000)
    fb = rng.multivariate_normal(np.zeros(6), cov, size=3000)
    got = fid_from_features(fa, fb)
    assert 0 <= got < 0.1


def test_fvd_alias_and_extract():
    rng = np.random.default_rng(3)
    batches = [rng.normal(size=(8, 4, 5)) for _ in range(3)]
    feats = extract_features(batches, lambda b: b.reshape(len(b), -1) * 2.0)
    assert feats.shape == (24, 20)
    assert fvd_from_features(feats, feats) == pytest.approx(0.0, abs=1e-8)
