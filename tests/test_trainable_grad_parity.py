"""Trainable-path gradient parity: pose encoder (stage 2) + object adapter
(stage 3) chained through the full UNet, vs torch autograd.

tests/test_grad_parity.py pins the UNet's own backward; but what stages 2/3
actually TRAIN is the CameraPoseEncoder and the OMC ObjectAdapter — their
gradients flow through the UNet's pose/traj injection points and back through
pixel-unshuffle / temporal-attention reshapes / avg-pool downsamples / the
mask-modulated zero-conv chain.  This test runs the full trainable chain

    plucker -> CameraPoseEncoder -> pose features \
                                                   > UNet3D -> masked loss
    raster+mask -> ObjectAdapter -> traj features /

in both frameworks (torch side transcribed from fmc/models/pose_adaptor.py:
159-240 and fmc/adapter.py:109-192 semantics) and matches the loss plus the
COMPLETE parameter-gradient trees of both encoders.

Quirk pinned in gradient-space: the adapter's 4th stage feeds only
traj_features[3], which the plain 4th down block never consumes
(unet_cam_obj.py:1227-1234) — so its body/zero-conv gradients must be
IDENTICALLY zero in both frameworks.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from synfmc_tpu.models.adapter import ObjectAdapter
from synfmc_tpu.models.pose_encoder import CameraPoseEncoder
from synfmc_tpu.models.unet3d import UNet3D
from synfmc_tpu.training.losses import masked_diffusion_loss

from tests.test_composed_parity import conv, dense, norm
from tests.test_fullstack_parity import TAttn, TGEGLU, TUNet3D, fold, unfold
from tests.test_grad_parity import _torch_grad_tree

torch.manual_seed(0)

MW, SW = 0.7, 0.3


class TAdapterRes(torch.nn.Module):
    """T2I-Adapter conv block (pose_adaptor.py:102-135 / adapter.py:64-98):
    optional avg-pool down, optional in_conv on channel change,
    block1(3x3) -> ReLU -> block2(ksize) -> + residual."""

    def __init__(self, cin, cout, down=False, ksize=3):
        super().__init__()
        self.down = down
        p = ksize // 2
        self.in_conv = torch.nn.Conv2d(cin, cout, ksize, padding=p) if cin != cout else None
        self.block1 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.block2 = torch.nn.Conv2d(cout, cout, ksize, padding=p)

    def forward(self, x):
        if self.down:
            x = F.avg_pool2d(x, 2)
        if self.in_conv is not None:
            x = self.in_conv(x)
        h = self.block2(F.relu(self.block1(x)))
        return h + x

    def params(self):
        p = {"block1": conv(self.block1), "block2": conv(self.block2)}
        if self.in_conv is not None:
            p["in_conv"] = conv(self.in_conv)
        return p


class TTempBlock(torch.nn.Module):
    """Bare TemporalTransformerBlock (motion_module.py:237-300), 1 attention
    block with sinusoidal PE: x += attn(norm(x)); x += ff(ff_norm(x))."""

    def __init__(self, c, heads, pe_max=16):
        super().__init__()
        self.norm = torch.nn.LayerNorm(c)
        self.attn = TAttn(c, None, heads, pe_max=pe_max)
        self.ff_norm = torch.nn.LayerNorm(c)
        self.ff = TGEGLU(c)

    def forward(self, x):  # (n, f, c)
        x = x + self.attn(self.norm(x))
        return x + self.ff(self.ff_norm(x))

    def params(self):
        return {"norms_0": norm(self.norm), "attention_blocks_0": self.attn.params(),
                "ff_norm": norm(self.ff_norm), "ff": self.ff.params()}


class TPoseEncoder(torch.nn.Module):
    """CameraPoseEncoder (pose_adaptor.py:159-240): PixelUnshuffle(8) ->
    conv_in -> 4 stages x nums_rb of [AdapterRes(ksize=1) + temporal block]
    with (b f) c h w <-> (b h w) f c reshapes (pose_adaptor.py:232-238)."""

    def __init__(self, chs=(32, 64, 128, 128), heads=4, nums_rb=2, ksize=1, pe_max=16):
        super().__init__()
        self.chs, self.nums_rb = chs, nums_rb
        self.unshuffle = torch.nn.PixelUnshuffle(8)
        self.conv_in = torch.nn.Conv2d(6 * 64, chs[0], 3, padding=1)
        self.convs = torch.nn.ModuleList()
        self.attns = torch.nn.ModuleList()
        for i, ch in enumerate(chs):
            for j in range(nums_rb):
                cin = chs[i - 1] if (j == 0 and i > 0) else ch
                self.convs.append(TAdapterRes(cin, ch, down=(j == 0 and i != 0), ksize=ksize))
                self.attns.append(TTempBlock(ch, heads, pe_max=pe_max))

    def forward(self, plucker):  # (b, f, 6, H, W)
        b, f = plucker.shape[:2]
        x = self.conv_in(self.unshuffle(fold(plucker)))
        feats = []
        k = 0
        for i in range(len(self.chs)):
            for j in range(self.nums_rb):
                x = self.convs[k](x)
                n, c, hh, ww = x.shape
                tokens = unfold(x, f).permute(0, 3, 4, 1, 2).reshape(b * hh * ww, f, c)
                tokens = self.attns[k](tokens)
                x = tokens.reshape(b, hh, ww, f, c).permute(0, 3, 4, 1, 2).reshape(n, c, hh, ww)
                k += 1
            feats.append(unfold(x, f))
        return feats

    def params(self):
        p = {"conv_in": conv(self.conv_in)}
        k = 0
        for i in range(len(self.chs)):
            for j in range(self.nums_rb):
                p[f"blocks_{i}_{j}_conv"] = self.convs[k].params()
                p[f"blocks_{i}_{j}_attn"] = self.attns[k].params()
                k += 1
        return p


class TObjectAdapter(torch.nn.Module):
    """OMC Adapter (adapter.py:109-192): PixelUnshuffle(8) -> zero_conv_in ->
    conv_in -> 4 stages x nums_rb AdapterRes -> zero_conv_out -> x * mask,
    with the MASKED output chaining into the next stage (adapter.py:171-182).
    Zero convs carry random weights here — zeros would kill the very gradients
    under test."""

    def __init__(self, cin=13, chs=(32, 64, 128, 128), nums_rb=2, ksize=3):
        super().__init__()
        self.chs, self.nums_rb = chs, nums_rb
        self.unshuffle = torch.nn.PixelUnshuffle(8)
        c0 = cin * 64
        self.zero_conv_in = torch.nn.Conv2d(c0, c0, 1)
        torch.nn.init.normal_(self.zero_conv_in.weight, std=0.05)
        self.conv_in = torch.nn.Conv2d(c0, chs[0], 3, padding=1)
        self.body = torch.nn.ModuleList()
        for i, ch in enumerate(chs):
            for j in range(nums_rb):
                cin_b = chs[i - 1] if (j == 0 and i > 0) else ch
                self.body.append(TAdapterRes(cin_b, ch, down=(j == 0 and i != 0), ksize=ksize))
        self.zero_out = torch.nn.ModuleList([torch.nn.Conv2d(ch, ch, 1) for ch in chs])
        for z in self.zero_out:
            torch.nn.init.normal_(z.weight, std=0.2)

    def forward(self, x, mask):  # (n, 13, H, W), (n, 1, H, W)
        x = self.conv_in(self.zero_conv_in(self.unshuffle(x)))
        feats = []
        for i in range(len(self.chs)):
            for j in range(self.nums_rb):
                x = self.body[i * self.nums_rb + j](x)
            x = self.zero_out[i](x)
            m = F.interpolate(mask, size=x.shape[2:], mode="nearest")
            x = x * m
            feats.append(x)
        return feats

    def params(self):
        p = {"zero_conv_in": conv(self.zero_conv_in), "conv_in": conv(self.conv_in)}
        for k, blk in enumerate(self.body):
            p[f"body_{k}"] = blk.params()
        for i, z in enumerate(self.zero_out):
            p[f"zero_conv_out_{i}"] = conv(z)
        return p


def _assert_tree_close(got, want, rtol=2e-3, what=""):
    assert jax.tree_util.tree_structure(got) == jax.tree_util.tree_structure(want)
    for (path, g), w in zip(jax.tree_util.tree_flatten_with_path(got)[0],
                            jax.tree_util.tree_leaves(want)):
        w = np.asarray(w)
        scale = max(np.abs(w).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(g), w, atol=2e-3 * scale, rtol=rtol,
            err_msg=f"{what} grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_stage23_trainable_grads_match_torch(rng):
    chs, heads, xdim, b, f, h, w = (32, 64, 128, 128), 4, 48, 1, 2, 16, 24
    H, W = 8 * h, 8 * w
    pose_scale = 0.5
    tpe = TPoseEncoder(chs, heads)
    tad = TObjectAdapter(13, chs)
    tun = TUNet3D(chs, heads, xdim, lora_rank=0, pose_scale=pose_scale)

    plucker = rng.normal(size=(b, f, H, W, 6)).astype(np.float32) * 0.3
    raster = rng.normal(size=(b * f, H, W, 13)).astype(np.float32) * 0.3
    rmask = (rng.uniform(size=(b * f, H, W, 1)) < 0.5).astype(np.float32)
    x = rng.normal(size=(b, f, h, w, 4)).astype(np.float32)
    noise = rng.normal(size=(b, f, h, w, 4)).astype(np.float32)
    ctx = rng.normal(size=(b, 7, xdim)).astype(np.float32)
    t = np.array([321])
    lmask = (rng.uniform(size=(b, f, h, w, 1)) < 0.4).astype(np.float32)

    # ---- torch chain ----
    pose_feats = tpe(torch.from_numpy(plucker).permute(0, 1, 4, 2, 3))
    traj_maps = tad(torch.from_numpy(raster).permute(0, 3, 1, 2),
                    torch.from_numpy(rmask).permute(0, 3, 1, 2))
    traj_feats = [unfold(m, f) for m in traj_maps]
    pred = tun(torch.from_numpy(x).permute(0, 1, 4, 2, 3), torch.from_numpy(t),
               torch.from_numpy(ctx), pose_feats, traj_feats)
    noise_t = torch.from_numpy(noise).permute(0, 1, 4, 2, 3)
    m_t = torch.from_numpy(lmask).permute(0, 1, 4, 2, 3)  # stage 3: NOT inverted
    loss_t = MW * torch.mean((pred * m_t - noise_t * m_t) ** 2) + SW * torch.mean((pred - noise_t) ** 2)
    loss_t.backward()

    # ---- jax chain with the same params ----
    pose_enc = CameraPoseEncoder(channels=chs, temporal_attention_nhead=heads)
    adapter = ObjectAdapter(channels=chs)
    unet = UNet3D(
        block_out_channels=chs, attn_heads=heads, cross_attention_dim=xdim,
        use_motion_module=True, motion_num_heads=heads, camera_cond=True,
        pose_scale=pose_scale,
    )
    unet_params = jax.tree.map(np.asarray, tun.params())
    pe_params = jax.tree.map(np.asarray, tpe.params())
    ad_params = jax.tree.map(np.asarray, tad.params())

    def loss_fn(pe_p, ad_p):
        pose = pose_enc.apply({"params": pe_p}, jnp.asarray(plucker))
        maps = adapter.apply({"params": ad_p}, jnp.asarray(raster), jnp.asarray(rmask))
        traj = [ft.reshape(b, f, *ft.shape[1:]) for ft in maps]
        pred = unet.apply({"params": unet_params}, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(ctx), pose_features=pose, traj_features=traj)
        loss, _ = masked_diffusion_loss(
            pred, jnp.asarray(noise), jnp.asarray(lmask),
            invert_mask=False, mask_loss_weight=MW, sd_loss_weight=SW,
        )
        return loss

    loss_j, (gpe, gad) = jax.value_and_grad(loss_fn, argnums=(0, 1))(pe_params, ad_params)
    np.testing.assert_allclose(float(loss_j), loss_t.detach().item(), rtol=1e-5)

    _assert_tree_close(gpe, _torch_grad_tree(tpe), what="pose encoder")
    gad_want = _torch_grad_tree(tad)
    _assert_tree_close(gad, gad_want, what="adapter")

    # the 4th adapter stage only feeds the never-consumed traj_features[3]:
    # its gradients must be exactly zero in BOTH frameworks
    for name in ("body_6", "body_7", "zero_conv_out_3"):
        for leaf in jax.tree_util.tree_leaves(gad[name]):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
        for leaf in jax.tree_util.tree_leaves(gad_want[name]):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
