"""First-party native image runtime (synfmc_tpu/native/fastimage.cpp).

The contract is BIT-EXACTNESS against the PIL path it replaces
(reference reads images via PIL at fmc/data/dataset.py:2149-2174 and masks
at fmc/data/dataset.py:330-341): same decode bytes, same BILINEAR resample
bytes (Pillow's fixed-point algorithm), same float32 scaling — so enabling
the native path cannot move any downstream numerics.
"""

import os

import numpy as np
import pytest
from PIL import Image

from synfmc_tpu.native import fastimage

pytestmark = pytest.mark.skipif(
    not fastimage.available(), reason="native fastimage unavailable (no g++/libpng)"
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize(
    "mode,shape",
    [("L", (37, 53)), ("RGB", (64, 96, 3)), ("RGBA", (41, 29, 4))],
)
def test_decode_bit_exact(tmp_path, rng, mode, shape):
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    p = str(tmp_path / f"{mode}.png")
    Image.fromarray(a, mode).save(p)
    got = fastimage.decode(p)
    ref = np.array(Image.open(p))
    assert got is not None and got.dtype == ref.dtype
    np.testing.assert_array_equal(got, ref)


def test_palette_png_falls_back_to_pil(tmp_path, rng):
    a = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    p = str(tmp_path / "pal.png")
    Image.fromarray(a, "L").convert("P").save(p)
    assert fastimage.decode(p) is None  # native declines
    ref = np.array(Image.open(p))
    np.testing.assert_array_equal(fastimage.imread(p), ref)  # fallback matches


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((256, 384), (128, 192)),  # 2x down
        ((123, 77), (256, 384)),   # odd up
        ((720, 1280), (256, 384)),  # non-integer down (real render res)
        ((50, 50), (37, 91)),      # mixed down/up
        ((256, 384), (256, 384)),  # identity
    ],
)
def test_resize_bit_exact_vs_pil(rng, in_hw, out_hw):
    a = rng.integers(0, 256, (*in_hw, 3), dtype=np.uint8)
    ref = np.array(Image.fromarray(a).resize(out_hw[::-1], Image.BILINEAR))
    got = fastimage.resize_bilinear(a, *out_hw)
    np.testing.assert_array_equal(got, ref)


def test_resize_grayscale_2d(rng):
    a = rng.integers(0, 256, (80, 60), dtype=np.uint8)
    ref = np.array(Image.fromarray(a, "L").resize((96, 64), Image.BILINEAR))
    got = fastimage.resize_bilinear(a, 64, 96)
    assert got.shape == (64, 96)
    np.testing.assert_array_equal(got, ref)


def test_batch_decode_matches_load_and_resize_contract(tmp_path, rng):
    """decode_resize_batch == stacked PIL convert('RGB')+BILINEAR+/255."""
    paths = []
    for i, mode in enumerate(["RGB", "L", "RGBA", "RGB"]):
        shape = (100 + 7 * i, 150 - 5 * i)
        a = rng.integers(
            0, 256, shape if mode == "L" else (*shape, len(mode)), dtype=np.uint8
        )
        p = str(tmp_path / f"f{i}.png")
        Image.fromarray(a, mode).save(p)
        paths.append(p)
    got = fastimage.decode_resize_batch(paths, 64, 96, threads=3)
    assert got is not None and got.shape == (4, 64, 96, 3) and got.dtype == np.float32
    ref = np.stack(
        [
            np.asarray(
                Image.open(p).convert("RGB").resize((96, 64), Image.BILINEAR),
                np.float32,
            )
            / 255.0
            for p in paths
        ]
    )
    np.testing.assert_array_equal(got, ref)


def test_batch_reports_failure_and_dataset_falls_back(tmp_path):
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not a png")
    assert fastimage.decode_resize_batch([bad], 8, 8) is None


def test_min_enclosing_circle_native_matches_python(rng):
    """The C++ MEC equals the Python Welzl fallback: the minimum enclosing
    circle is unique, so both must agree to float tolerance, and every point
    must be inside."""
    from synfmc_tpu.data import masks

    for _ in range(50):
        n = int(rng.integers(1, 400))
        pts = rng.integers(0, 300, (n, 2)).astype(np.float64)
        got = fastimage.min_enclosing_circle(pts)
        assert got is not None
        (cx, cy), r = got
        d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
        assert (d <= r + 1e-6).all()
        # Python path (forced) must give the same circle
        (pcx, pcy), pr = masks._python_min_enclosing_circle(pts)
        assert abs(r - pr) < 1e-6
        assert np.hypot(cx - pcx, cy - pcy) < 1e-6


def test_dataset_pixels_identical_native_vs_pil(tmp_path, monkeypatch):
    """The full get_batch output is byte-identical with native IO on or off."""
    from synfmc_tpu.data.dataset import UnrealTrajVideoDataset
    from synfmc_tpu.data.fixture import build_synthetic_dataset

    kw = build_synthetic_dataset(str(tmp_path), num_seqs=1, num_objects=2,
                                 num_frames=24, height=64, width=96)

    def build():
        return UnrealTrajVideoDataset(
            **kw, sample_n_frames=4, sample_size=(48, 64),
            cam_translation_rescale_factor=1200,
            obj_translation_rescale_factor=1000,
            use_sphere_mask=True, max_objects=2, seed=3,
        )

    native = build()[0]

    # force the PIL path without re-importing (the loader honors
    # SYNFMC_NATIVE_IO=0 at .so load time; here the lib is already loaded)
    monkeypatch.setattr(fastimage, "decode_resize_batch",
                        lambda *a, **k: None)
    monkeypatch.setattr(fastimage, "decode", lambda *a, **k: None)
    pil = build()[0]

    for key in ("pixel_values", "obj_union_mask", "obj_masks", "camera_rt",
                "obj_info"):
        np.testing.assert_array_equal(native[key], pil[key], err_msg=key)
    assert native["caption"] == pil["caption"]
