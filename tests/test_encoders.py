"""Tests for the CMC camera encoder and OMC object adapter."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from synfmc_tpu.models.adapter import ObjectAdapter
from synfmc_tpu.models.pose_encoder import AdapterResnetBlock, CameraPoseEncoder
from synfmc_tpu.ops.pixel import nearest_resize, pixel_shuffle, pixel_unshuffle


def test_pixel_unshuffle_matches_torch(rng):
    x = rng.normal(size=(2, 16, 24, 6)).astype(np.float32)
    got = np.asarray(pixel_unshuffle(jnp.asarray(x), 8))
    want = (
        torch.nn.PixelUnshuffle(8)(torch.from_numpy(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=0)
    back = np.asarray(pixel_shuffle(jnp.asarray(got), 8))
    np.testing.assert_allclose(back, x, atol=0)


def test_nearest_resize_matches_torch(rng):
    x = rng.normal(size=(2, 9, 13, 1)).astype(np.float32)
    for oh, ow in [(5, 7), (3, 3), (9, 13)]:
        got = np.asarray(nearest_resize(jnp.asarray(x), oh, ow))
        want = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2), size=(oh, ow), mode="nearest"
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=0)


def _torch_adapter_resblock(in_c, out_c, down, ksize):
    """Transcription of reference adapter.py:64-98 with sk=True, use_conv=False."""

    class B(torch.nn.Module):
        def __init__(self):
            super().__init__()
            ps = ksize // 2
            self.in_conv = torch.nn.Conv2d(in_c, out_c, ksize, 1, ps) if in_c != out_c else None
            self.block1 = torch.nn.Conv2d(out_c, out_c, 3, 1, 1)
            self.block2 = torch.nn.Conv2d(out_c, out_c, ksize, 1, ps)
            self.down = down

        def forward(self, x):
            if self.down:
                x = torch.nn.functional.avg_pool2d(x, 2, 2)
            if self.in_conv is not None:
                x = self.in_conv(x)
            h = self.block2(torch.relu(self.block1(x)))
            return h + x

    return B()


def _conv_params(tmod):
    return {
        "kernel": jnp.asarray(tmod.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(tmod.bias.detach().numpy()),
    }


def test_adapter_resblock_matches_torch(rng):
    for in_c, out_c, down, ksize in [(32, 64, False, 1), (64, 64, True, 3), (32, 32, False, 3)]:
        x = rng.normal(size=(2, 8, 8, in_c)).astype(np.float32)
        tb = _torch_adapter_resblock(in_c, out_c, down, ksize)
        want = tb(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
        params = {"block1": _conv_params(tb.block1), "block2": _conv_params(tb.block2)}
        if tb.in_conv is not None:
            params["in_conv"] = _conv_params(tb.in_conv)
        blk = AdapterResnetBlock(out_channels=out_c, down=down, ksize=ksize)
        got = np.asarray(blk.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_camera_pose_encoder_shapes(rng):
    b, f, h, w = 1, 4, 64, 96
    channels = (32, 64, 128, 128)
    plucker = jnp.asarray(rng.normal(size=(b, f, h, w, 6)).astype(np.float32))
    enc = CameraPoseEncoder(channels=channels, temporal_attention_nhead=4)
    v = enc.init(jax.random.PRNGKey(0), plucker)
    feats = enc.apply(v, plucker)
    assert len(feats) == 4
    # After unshuffle(8): 4x6 spatial; stages downsample x2 from stage 1 on.
    assert feats[0].shape == (b, f, 8, 12, 32)
    assert feats[1].shape == (b, f, 4, 6, 64)
    assert [ft.shape[-1] for ft in feats] == list(channels)


def test_object_adapter_zero_init_and_mask(rng):
    n, h, w = 4, 64, 96
    channels = (32, 64, 128, 128)
    x = jnp.asarray(rng.normal(size=(n, h, w, 13)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(n, h, w, 1)) > 0.5).astype(np.float32))
    ad = ObjectAdapter(channels=channels)
    v = ad.init(jax.random.PRNGKey(0), x, mask)
    feats = ad.apply(v, x, mask)
    assert [ft.shape[-1] for ft in feats] == list(channels)
    # zero conv in AND out => all features exactly zero at init (ControlNet-style)
    for ft in feats:
        assert np.abs(np.asarray(ft)).max() == 0.0

    # without zero convs, mask gating must zero out masked regions of stage 0
    ad2 = ObjectAdapter(channels=channels, use_pre_zero_conv=False, use_post_zero_conv=False)
    v2 = ad2.init(jax.random.PRNGKey(1), x, mask)
    f2 = ad2.apply(v2, x, mask)
    m0 = np.asarray(nearest_resize(mask, f2[0].shape[1], f2[0].shape[2]))
    np.testing.assert_allclose(np.asarray(f2[0]) * (1 - m0), 0.0, atol=0)
