"""Mask utilities (pure numpy — replaces the reference's cv2 dependency).

Parity targets:
- ``is_normal_size`` bbox-area visibility test (fmc/data/utils.py:87-109),
- ``assemble_mask_list`` union (utils.py:113-120),
- minimum enclosing circle (cv2.minEnclosingCircle) via Welzl's algorithm on
  the convex hull,
- Gaussian "sphere" masks: filled circle x Gaussian falloff sigma=radius/2
  (fmc/data/dataset.py:5350-5404).
"""

from __future__ import annotations

import math
import random

import numpy as np


def is_normal_size(mask: np.ndarray, percentage: float = 0.015) -> bool:
    """Bounding-box area >= percentage of the image (utils.py:87-109)."""
    if mask.ndim == 3:
        mask = mask[..., 0]
    h, w = mask.shape[:2]
    nz = mask > 0
    rows = nz.any(axis=1)
    cols = nz.any(axis=0)
    if not rows.any():
        return False
    rmin, rmax = rows.argmax(), h - 1 - rows[::-1].argmax()
    cmin, cmax = cols.argmax(), w - 1 - cols[::-1].argmax()
    area = (rmax - rmin + 1) * (cmax - cmin + 1)
    return area > h * w * percentage


def assemble_mask_list(mask_list: list[np.ndarray]) -> np.ndarray:
    assert len(mask_list) > 0
    total = np.zeros_like(mask_list[0], dtype=bool)
    for m in mask_list:
        total |= m.astype(bool)
    return total


def _row_extremes(points: np.ndarray) -> np.ndarray:
    """Reduce dense pixel coordinates to per-row min/max-x candidates.

    The convex hull (hence the min enclosing circle) of a pixel set is
    fully determined by each row's leftmost/rightmost pixel — an O(N)
    pass that shrinks hull input from ~10^4 mask pixels to ~2*H points.
    """
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) <= 4:
        return pts
    ys = pts[:, 1]
    order = np.argsort(ys, kind="stable")
    pts = pts[order]
    ys = pts[:, 1]
    starts = np.flatnonzero(np.r_[True, ys[1:] != ys[:-1]])
    ends = np.r_[starts[1:], len(pts)]
    out = []
    for s, e in zip(starts, ends):
        row = pts[s:e]
        out.append(row[row[:, 0].argmin()])
        out.append(row[row[:, 0].argmax()])
    return np.unique(np.stack(out), axis=0)


def _convex_hull(points: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull; points (N, 2) float."""
    pts = np.unique(_row_extremes(points), axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower, upper = [], []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(tuple(p))
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(tuple(p))
    return np.array(lower[:-1] + upper[:-1])


def _circle_from(points) -> tuple[np.ndarray, float]:
    if len(points) == 0:
        return np.zeros(2), 0.0
    if len(points) == 1:
        return np.asarray(points[0], float), 0.0
    if len(points) == 2:
        c = (np.asarray(points[0], float) + np.asarray(points[1], float)) / 2
        return c, float(np.linalg.norm(points[0] - c))
    (ax, ay), (bx, by), (cx, cy) = points
    d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-12:
        # collinear: use the farthest pair
        pts = np.asarray(points, float)
        dists = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        i, j = np.unravel_index(dists.argmax(), dists.shape)
        return _circle_from([pts[i], pts[j]])
    ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay) + (cx**2 + cy**2) * (ay - by)) / d
    uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx) + (cx**2 + cy**2) * (bx - ax)) / d
    c = np.array([ux, uy])
    return c, float(np.linalg.norm(np.asarray(points[0], float) - c))


def min_enclosing_circle(points: np.ndarray) -> tuple[tuple[float, float], float]:
    """Exact minimum enclosing circle (Welzl on the convex hull) —
    cv2.minEnclosingCircle replacement.  points: (N, 2) as (x, y).

    Fast path: the first-party C++ implementation (the Python Welzl below is
    the hottest loader cost after image decode); both compute the unique
    exact MEC, differing only in last-ulp arithmetic order.
    """
    from synfmc_tpu.native import fastimage

    native = fastimage.min_enclosing_circle(np.asarray(points, np.float64))
    if native is not None:
        return native
    return _python_min_enclosing_circle(points)


def _python_min_enclosing_circle(points: np.ndarray) -> tuple[tuple[float, float], float]:
    """Pure-Python Welzl fallback (also the native path's test oracle)."""
    pts = _convex_hull(np.asarray(points, dtype=np.float64))
    shuffled = list(pts)
    random.Random(0).shuffle(shuffled)

    def welzl(pts_list, boundary):
        if not pts_list or len(boundary) == 3:
            return _circle_from(boundary)
        p = pts_list[0]
        c, r = welzl(pts_list[1:], boundary)
        if np.linalg.norm(np.asarray(p, float) - c) <= r + 1e-9:
            return c, r
        return welzl(pts_list[1:], boundary + [p])

    c, r = welzl(shuffled, [])
    return (float(c[0]), float(c[1])), float(r)


def sphere_gaussian_mask(mask: np.ndarray, center_override=None) -> np.ndarray:
    """Gaussian sphere mask from a binary object mask (dataset.py:5350-5404).

    minEnclosingCircle of the mask pixels -> filled int-circle x normalized
    Gaussian(sigma = radius/2) of distance from center.  Empty masks return
    the input's first channel unchanged.

    ``center_override`` (x, y) relocates the circle center while keeping the
    mask-derived radius — the create_validation_prompts_with_traj_change
    mechanism (reference dataset.py:4490-4523) that drags an object's motion
    target along a user-supplied 2D path.
    """
    m2d = mask[..., 0] if mask.ndim == 3 else mask
    y, x = np.nonzero(m2d)
    if len(x) == 0:
        return m2d.astype(np.float32)
    (cx, cy), radius = min_enclosing_circle(np.column_stack((x, y)))
    if center_override is not None:
        cx, cy = float(center_override[0]), float(center_override[1])
    h, w = m2d.shape
    # The full-image product (circle * g / g.max()) is zero outside the int
    # circle's bounding box, so compute only that slab — bit-identical
    # because each in-box pixel sees the same elementwise float ops.
    icx, icy, ir = int(cx), int(cy), int(radius)
    y0, y1 = max(icy - ir, 0), min(icy + ir + 1, h)
    x0, x1 = max(icx - ir, 0), min(icx + ir + 1, w)
    out = np.zeros((h, w), np.float32)
    if y0 >= y1 or x0 >= x1:
        return out
    # g.max() over the full grid = g at the in-image pixel nearest the float
    # center; evaluate it with the exact same expression the slab uses.
    nx = min(max(int(round(cx)), 0), w - 1)
    ny = min(max(int(round(cy)), 0), h - 1)
    sigma = max(radius / 2.0, 1e-6)
    gmax = np.exp(-0.5 * (np.sqrt((nx - cx) ** 2 + (ny - cy) ** 2) / sigma) ** 2)
    if gmax == 0.0:
        # Gaussian underflowed everywhere (center_override dragged far from a
        # tiny mask): the limit is an all-zero mask.  (The previous full-image
        # formula returned 0/0 = NaN here and poisoned downstream arrays.)
        return out
    yy, xx = np.ogrid[y0:y1, x0:x1]
    dist = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    # cv2.circle with int center/radius: replicate the int truncation
    circle = np.sqrt((xx - icx) ** 2 + (yy - icy) ** 2) <= ir
    g = np.exp(-0.5 * (dist / sigma) ** 2)
    out[y0:y1, x0:x1] = (circle * (g / gmax)).astype(np.float32)
    return out


def resize_mask_nearest(mask: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor mask resize (host-side, numpy)."""
    h, w = mask.shape[:2]
    if h == out_h and w == out_w:
        return mask
    rows = (np.arange(out_h) * (h / out_h)).astype(np.int64)
    cols = (np.arange(out_w) * (w / out_w)).astype(np.int64)
    return mask[rows[:, None], cols]
