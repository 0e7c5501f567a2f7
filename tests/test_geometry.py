"""Geometry parity tests.

Each test re-derives the reference math (fmc/data/utils.py, dataset.py
ray_condition) with independent scalar/loop numpy code and checks our
vectorized / jitted implementations against it.
"""

import math

import numpy as np
import pytest

from synfmc_tpu.geometry import (
    absolute_from_relative_cams,
    euler_to_matrix,
    euler_to_matrix_v2,
    plucker_embedding,
    relative_cams_to_first,
    relative_obj_to_cam,
)


def _ref_euler_v1(roll, pitch, yaw):
    # Scalar transcription of reference utils.py:54-61 (incl. the [2][1] quirk).
    x, y, z = [math.radians(v) for v in (roll, pitch, yaw)]
    c, s = math.cos, math.sin
    return np.array(
        [
            [c(y) * c(z), -c(y) * s(z), -s(y)],
            [s(x) * s(y) * c(z) + c(x) * s(z), -s(x) * s(y) * s(z) + c(x) * c(z), s(x) * c(y)],
            [c(x) * s(y) * c(z) - s(x) * s(z), -c(x) * s(y) * c(z) - s(x) * c(z), c(x) * c(y)],
        ]
    )


def _ref_euler_v2(roll, pitch, yaw):
    # Scalar transcription of reference utils.py:64-71.
    x, y, z = [math.radians(v) for v in (roll, pitch, yaw)]
    c, s = math.cos, math.sin
    return np.array(
        [
            [c(y) * c(z), c(z) * s(x) * s(y) - c(x) * s(z), -s(x) * s(z) - c(x) * c(z) * s(y)],
            [c(y) * s(z), c(x) * c(z) + s(x) * s(y) * s(z), -c(x) * s(z) * s(y) + s(x) * c(z)],
            [s(y), -c(y) * s(x), c(x) * c(y)],
        ]
    )


@pytest.mark.parametrize("angles", [(0, 0, 0), (30, -45, 60), (123, 7, -170), (-90, 90, 45)])
def test_euler_v1_matches_reference_formula(angles):
    np.testing.assert_allclose(euler_to_matrix(*angles), _ref_euler_v1(*angles), atol=1e-12)


@pytest.mark.parametrize("angles", [(0, 0, 0), (30, -45, 60), (123, 7, -170), (-90, 90, 45)])
def test_euler_v2_matches_reference_formula(angles):
    np.testing.assert_allclose(euler_to_matrix_v2(*angles), _ref_euler_v2(*angles), atol=1e-12)


def test_euler_v2_is_rotation():
    r = euler_to_matrix_v2(33.0, -12.0, 140.0)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(r) == pytest.approx(1.0)


def test_euler_batched():
    rolls = np.array([0.0, 30.0, -60.0])
    batched = euler_to_matrix_v2(rolls, 10.0, 20.0)
    assert batched.shape == (3, 3, 3)
    for i, r in enumerate(rolls):
        np.testing.assert_allclose(batched[i], _ref_euler_v2(r, 10.0, 20.0), atol=1e-12)


def _random_rt(rng, n):
    """Random valid 4x4 pose matrices."""
    out = []
    for _ in range(n):
        r = _ref_euler_v2(*rng.uniform(-180, 180, 3))
        t = rng.uniform(-2000, 2000, 3)
        m = np.eye(4)
        m[:3, :3] = r
        m[:3, 3] = t
        out.append(m)
    return np.stack(out)


def _ref_relative_cam_list(rt_list, scale_t):
    # Loop transcription of reference utils.py:148-163.
    rts = [np.copy(rt[:3]) for rt in rt_list]
    first = np.copy(rts[0])
    first_r, first_t = first[:, :3], first[:, -1]
    temp = []
    for rt in rts:
        rt = np.copy(rt)
        rt[:, -1] = -np.dot(rt[:, :3].T, rt[:, -1]) + np.dot(rt[:, :3].T, first_t)
        rt[:, :3] = np.dot(rt[:, :3].T, first_r)
        rt[:, -1] = rt[:, -1] / scale_t
        temp.append(rt)
    temp[0] = np.eye(3, 4)
    return np.stack([t.reshape(-1) for t in temp])


def test_relative_cams_to_first(rng):
    rts = _random_rt(rng, 16)
    got = relative_cams_to_first(rts, scale_t=1200.0)
    want = _ref_relative_cam_list(rts, 1200.0)
    assert got.shape == (16, 12)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_relative_obj_to_cam(rng):
    cam = _random_rt(rng, 1)[0]
    objs = _random_rt(rng, 16)
    got = relative_obj_to_cam(cam, objs, scale_t=1000.0)
    # Loop transcription of reference utils.py:185-200.
    want = []
    for rt2 in objs:
        rt2 = np.copy(rt2[:3])
        r2t = rt2[:, :3].T
        t = (-r2t @ rt2[:, -1] + r2t @ cam[:3, -1]) / 1000.0
        r = r2t @ cam[:3, :3]
        want.append(np.concatenate([r, t[:, None]], -1).reshape(-1))
    np.testing.assert_allclose(got, np.stack(want), atol=1e-5)


def test_relative_absolute_roundtrip(rng):
    rts = _random_rt(rng, 16)
    rel = relative_cams_to_first(rts, scale_t=1200.0).reshape(16, 3, 4)
    absolute = absolute_from_relative_cams(rts[0], rel, scale_t=1200.0)
    # Roundtrip recovers cameras up to the reference's own convention:
    # frame 0 exactly; others via inv().
    np.testing.assert_allclose(absolute[0], rts[0][:3], atol=1e-4)
    assert absolute.shape == (16, 3, 4)


def _ref_ray_condition(K, c2w, H, W):
    # Loop transcription of reference dataset.py:930-972.
    B, V = K.shape[:2]
    out = np.zeros((B, V, H, W, 6))
    for b in range(B):
        for v in range(V):
            fx, fy, cx, cy = K[b, v]
            jj, ii = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
            xs = (ii - cx) / fx
            ys = (jj - cy) / fy
            zs = np.ones_like(xs)
            d = np.stack([xs, ys, zs], -1)
            d = d / np.linalg.norm(d, axis=-1, keepdims=True)
            rays_d = d @ c2w[b, v, :3, :3].T
            rays_o = np.broadcast_to(c2w[b, v, :3, 3], rays_d.shape)
            out[b, v] = np.concatenate([np.cross(rays_o, rays_d), rays_d], -1)
    return out


def test_plucker_embedding_matches_reference(rng):
    B, V, H, W = 2, 4, 8, 12
    K = np.stack(
        [rng.uniform(100, 400, (B, V)), rng.uniform(100, 400, (B, V)), np.zeros((B, V)), np.zeros((B, V))],
        axis=-1,
    )
    c2w = _random_rt(rng, B * V).reshape(B, V, 4, 4)
    got = np.asarray(plucker_embedding(K.astype(np.float32), c2w.astype(np.float32), H, W))
    want = _ref_ray_condition(K, c2w, H, W)
    assert got.shape == (B, V, H, W, 6)
    # float32 device compute vs float64 host reference: compare relatively
    # (the o x d channel scales with |T| ~ 2000).
    rel_err = np.abs(got - want) / (1.0 + np.abs(want))
    assert rel_err.max() < 5e-3
