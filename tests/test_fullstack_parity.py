"""FULL-STACK elementwise parity vs in-test torch transcriptions.

tests/test_composed_parity.py proves the composites (spatial transformer,
temporal transformer, resnet) match torch per-module; these tests close the
*composition* gap — a wiring bug in skip ordering, time-embedding broadcast,
pose/traj injection points, or the VAE/CLIP topologies is exactly what
piecewise tests miss and what would silently destroy PSNR when real weights
arrive.

Transcribed semantics (not code) from:
- full UNet3D graph: /root/reference/fmc/models/unet.py:1033-1300 (down blocks get
  pose_embedding_features[i], mid gets [-1], up block i gets [-(i+1)];
  res_samples popped per up-block resnet), unet_blocks.py:360-430
  (resnet -> spatial attn -> motion module per layer, downsample appended to
  skips), modified_modules.py:115-117 (traj residual added to the block
  output AND replacing the last skip, before downsampling; the plain 4th
  down block never receives traj features — quirk preserved),
  attention_processor.py:255-258 (qkv_merge(h + pose)*scale + h, self-attn
  with q=k=v conditioned), motion_module.py:355-356 (PE before pose merge).
- VAE: diffusers AutoencoderKL (SD1.5 config): encoder 2 resnets/level +
  downsample between levels, mid resnet-attn(1 head, qkv bias)-resnet,
  GN(32, eps 1e-6), quant/post_quant 1x1, decoder 3 resnets/level.
- CLIP text: transformers CLIPTextModel: token+pos embed, pre-LN blocks with
  causal mask, quick_gelu MLP, final LN.

All fp32, elementwise allclose at atol<=1e-4.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from synfmc_tpu.models.clip_text import CLIPTextModel
from synfmc_tpu.models.unet3d import UNet3D
from synfmc_tpu.models.vae import AutoencoderKL

from tests.test_composed_parity import conv, dense, norm, t2j

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torch building blocks (reference semantics, written against the cites above)
# ---------------------------------------------------------------------------


def fold(x):  # (b, f, c, h, w) -> (b*f, c, h, w)
    b, f, c, h, w = x.shape
    return x.reshape(b * f, c, h, w)


def unfold(x, f):
    n, c, h, w = x.shape
    return x.reshape(n // f, f, c, h, w)


class TResnet(torch.nn.Module):
    """diffusers ResnetBlock2D: norm1+silu->conv1->(+temb proj)->norm2+silu->conv2->+shortcut."""

    def __init__(self, cin, cout, temb_dim=None, eps=1e-6):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = torch.nn.Linear(temb_dim, cout) if temb_dim else None
        self.norm2 = torch.nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.shortcut = torch.nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if self.time_emb_proj is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.shortcut(x) if self.shortcut is not None else x
        return sc + h

    def params(self):
        p = {"norm1": norm(self.norm1), "conv1": conv(self.conv1),
             "norm2": norm(self.norm2), "conv2": conv(self.conv2)}
        if self.time_emb_proj is not None:
            p["time_emb_proj"] = dense(self.time_emb_proj)
        if self.shortcut is not None:
            p["conv_shortcut"] = conv(self.shortcut)
        return p


class TLoRA(torch.nn.Module):
    """diffusers LoRALinearLayer (random weights here — parity needs nonzero up)."""

    def __init__(self, cin, cout, rank):
        super().__init__()
        self.down = torch.nn.Linear(cin, rank, bias=False)
        self.up = torch.nn.Linear(rank, cout, bias=False)
        torch.nn.init.normal_(self.up.weight, std=0.2)

    def forward(self, x):
        return self.up(self.down(x))

    def params(self):
        return {"down": dense(self.down), "up": dense(self.up)}


class TAttn(torch.nn.Module):
    """diffusers Attention + the reference processor behaviors:
    lora_rank>0 = LoRAAttnProcessor branches; pose=True = PoseAdaptor qkv_merge
    (attention_processor.py:189-192, 255-258); pe_max>0 = TemporalSelfAttention
    positional encoding before the merge (motion_module.py:355-356)."""

    def __init__(self, dim, ctx_dim, heads, lora_rank=0, pose=False, pose_scale=1.0, pe_max=0):
        super().__init__()
        self.heads, self.pose_scale = heads, pose_scale
        self.to_q = torch.nn.Linear(dim, dim, bias=False)
        self.to_k = torch.nn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_v = torch.nn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_out = torch.nn.Linear(dim, dim)
        self.qkv_merge = torch.nn.Linear(dim, dim) if pose else None
        if self.qkv_merge is not None:  # zero-init in training; random for parity
            torch.nn.init.normal_(self.qkv_merge.weight, std=0.2)
        self.loras = None
        if lora_rank > 0:
            self.loras = torch.nn.ModuleDict({
                "q": TLoRA(dim, dim, lora_rank), "k": TLoRA(ctx_dim or dim, dim, lora_rank),
                "v": TLoRA(ctx_dim or dim, dim, lora_rank), "o": TLoRA(dim, dim, lora_rank),
            })
        if pe_max:
            pos = torch.arange(pe_max).unsqueeze(1)
            div = torch.exp(torch.arange(0, dim, 2) * (-math.log(10000.0) / dim))
            pe = torch.zeros(1, pe_max, dim)
            pe[0, :, 0::2] = torch.sin(pos * div)
            pe[0, :, 1::2] = torch.cos(pos * div)
            self.register_buffer("pe", pe)
        else:
            self.pe = None

    def forward(self, x, ctx=None, pose=None):
        if self.pe is not None:
            x = x + self.pe[:, : x.size(1)]
        if self.qkv_merge is not None:
            assert ctx is None and pose is not None
            q_in = kv_in = self.qkv_merge(x + pose) * self.pose_scale + x
        else:
            q_in, kv_in = x, (ctx if ctx is not None else x)
        q, k, v = self.to_q(q_in), self.to_k(kv_in), self.to_v(kv_in)
        if self.loras is not None:
            q = q + self.loras["q"](q_in)
            k = k + self.loras["k"](kv_in)
            v = v + self.loras["v"](kv_in)
        b, s, c = q.shape
        d = c // self.heads
        q = q.reshape(b, s, self.heads, d).permute(0, 2, 1, 3)
        k = k.reshape(b, kv_in.shape[1], self.heads, d).permute(0, 2, 1, 3)
        v = v.reshape(b, kv_in.shape[1], self.heads, d).permute(0, 2, 1, 3)
        o = (torch.softmax(q @ k.transpose(-1, -2) * d**-0.5, -1) @ v)
        o = o.permute(0, 2, 1, 3).reshape(b, s, c)
        out = self.to_out(o)
        if self.loras is not None:
            out = out + self.loras["o"](o)
        return out

    def params(self):
        p = {"to_q": dense(self.to_q), "to_k": dense(self.to_k),
             "to_v": dense(self.to_v), "to_out": dense(self.to_out)}
        if self.qkv_merge is not None:
            p["qkv_merge"] = dense(self.qkv_merge)
        if self.loras is not None:
            p["to_q_lora"] = self.loras["q"].params()
            p["to_k_lora"] = self.loras["k"].params()
            p["to_v_lora"] = self.loras["v"].params()
            p["to_out_lora"] = self.loras["o"].params()
        return p


class TGEGLU(torch.nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = torch.nn.Linear(dim, dim * 8)
        self.out = torch.nn.Linear(dim * 4, dim)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, -1)
        return self.out(h * F.gelu(gate))

    def params(self):
        return {"net_0_proj": dense(self.proj), "net_2": dense(self.out)}


class TSpatial(torch.nn.Module):
    """diffusers Transformer2DModel depth 1, with optional LoRA processors."""

    def __init__(self, c, ctx_dim, heads, lora_rank=0):
        super().__init__()
        self.norm = torch.nn.GroupNorm(32, c, eps=1e-6)
        self.proj_in = torch.nn.Conv2d(c, c, 1)
        self.norm1 = torch.nn.LayerNorm(c)
        self.attn1 = TAttn(c, None, heads, lora_rank=lora_rank)
        self.norm2 = torch.nn.LayerNorm(c)
        self.attn2 = TAttn(c, ctx_dim, heads, lora_rank=lora_rank)
        self.norm3 = torch.nn.LayerNorm(c)
        self.ff = TGEGLU(c)
        self.proj_out = torch.nn.Conv2d(c, c, 1)

    def forward(self, x, ctx):  # x (n, c, h, w)
        n, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x)).flatten(2).transpose(1, 2)
        y = y + self.attn1(self.norm1(y))
        y = y + self.attn2(self.norm2(y), ctx)
        y = y + self.ff(self.norm3(y))
        return self.proj_out(y.transpose(1, 2).reshape(n, c, h, w)) + res

    def params(self):
        return {
            "norm": norm(self.norm), "proj_in": conv(self.proj_in),
            "proj_out": conv(self.proj_out),
            "blocks_0": {
                "norm1": norm(self.norm1), "attn1": self.attn1.params(),
                "norm2": norm(self.norm2), "attn2": self.attn2.params(),
                "norm3": norm(self.norm3), "ff": self.ff.params(),
            },
        }


class TTemporal(torch.nn.Module):
    """reference VanillaTemporalModule/TemporalTransformer3DModel with the
    PoseAdaptor processor on attention block 0 (temporal_attn_names='0')."""

    def __init__(self, c, heads, pose=False, pose_scale=1.0, pe_max=32):
        super().__init__()
        self.norm = torch.nn.GroupNorm(32, c, eps=1e-6)
        self.proj_in = torch.nn.Linear(c, c)
        self.attns = torch.nn.ModuleList([
            TAttn(c, None, heads, pose=pose and i == 0, pose_scale=pose_scale, pe_max=pe_max)
            for i in range(2)
        ])
        self.norms = torch.nn.ModuleList([torch.nn.LayerNorm(c) for _ in range(2)])
        self.ff_norm = torch.nn.LayerNorm(c)
        self.ff = TGEGLU(c)
        self.proj_out = torch.nn.Linear(c, c)

    def forward(self, x, pose=None):  # x (b, f, c, h, w); pose same layout
        b, f, c, h, w = x.shape
        res = x
        y = self.norm(fold(x))
        y = unfold(y, f).permute(0, 3, 4, 1, 2).reshape(b * h * w, f, c)
        y = self.proj_in(y)
        ptok = None
        if pose is not None:
            ptok = pose.permute(0, 3, 4, 1, 2).reshape(b * h * w, f, pose.shape[2])
        for i, (attn, ln) in enumerate(zip(self.attns, self.norms)):
            y = attn(ln(y), pose=ptok if attn.qkv_merge is not None else None) + y
        y = self.ff(self.ff_norm(y)) + y
        y = self.proj_out(y)
        y = y.reshape(b, h, w, f, c).permute(0, 3, 4, 1, 2)
        return y + res

    def params(self):
        blk = {"ff_norm": norm(self.ff_norm), "ff": self.ff.params()}
        for i in range(2):
            blk[f"norms_{i}"] = norm(self.norms[i])
            blk[f"attention_blocks_{i}"] = self.attns[i].params()
        return {"norm": norm(self.norm), "proj_in": dense(self.proj_in),
                "proj_out": dense(self.proj_out), "transformer_blocks_0": blk}


class TDown(torch.nn.Module):
    """CrossAttnDownBlock3D / DownBlock3D (cross=False) with the stage-3
    adapted traj injection (modified_modules.py:115-117)."""

    def __init__(self, cin, cout, heads, xdim, temb_dim, lora_rank, pose_scale,
                 cross=True, downsample=True):
        super().__init__()
        self.cross, self.downsample = cross, downsample
        ins = [cin, cout]
        self.resnets = torch.nn.ModuleList([TResnet(i, cout, temb_dim) for i in ins])
        if cross:
            self.attns = torch.nn.ModuleList(
                [TSpatial(cout, xdim, heads, lora_rank) for _ in ins])
        self.mms = torch.nn.ModuleList(
            [TTemporal(cout, heads, pose=True, pose_scale=pose_scale) for _ in ins])
        if downsample:
            self.down = torch.nn.Conv2d(cout, cout, 3, stride=2, padding=1)

    def forward(self, x, temb_rep, ctx_rep, pose, traj):
        f = x.shape[1]
        outs = []
        for i in range(2):
            h = self.resnets[i](fold(x), temb_rep)
            if self.cross:
                h = self.attns[i](h, ctx_rep)
            x = self.mms[i](unfold(h, f), pose)
            outs.append(x)
        if traj is not None:
            x = x + traj
            outs[-1] = x
        if self.downsample:
            x = unfold(self.down(fold(x)), f)
            outs.append(x)
        return x, outs

    def params(self):
        p = {}
        for i in range(2):
            p[f"resnets_{i}"] = self.resnets[i].params()
            if self.cross:
                p[f"attentions_{i}"] = self.attns[i].params()
            p[f"motion_modules_{i}"] = self.mms[i].params()
        if self.downsample:
            p["downsamplers_0"] = {"conv": conv(self.down)}
        return p


class TUp(torch.nn.Module):
    """CrossAttnUpBlock3D / UpBlock3D: pop skip, concat, resnet, (attn), mm."""

    def __init__(self, cins, cout, heads, xdim, temb_dim, lora_rank, pose_scale,
                 cross=True, upsample=True):
        super().__init__()
        self.cross, self.upsample = cross, upsample
        self.resnets = torch.nn.ModuleList([TResnet(ci, cout, temb_dim) for ci in cins])
        if cross:
            self.attns = torch.nn.ModuleList(
                [TSpatial(cout, xdim, heads, lora_rank) for _ in cins])
        self.mms = torch.nn.ModuleList(
            [TTemporal(cout, heads, pose=True, pose_scale=pose_scale) for _ in cins])
        if upsample:
            self.up = torch.nn.Conv2d(cout, cout, 3, padding=1)

    def forward(self, x, skips, temb_rep, ctx_rep, pose):
        f = x.shape[1]
        for i in range(len(self.resnets)):
            x = torch.cat([x, skips.pop()], dim=2)  # channel axis of (b,f,c,h,w)
            h = self.resnets[i](fold(x), temb_rep)
            if self.cross:
                h = self.attns[i](h, ctx_rep)
            x = self.mms[i](unfold(h, f), pose)
        if self.upsample:
            h = F.interpolate(fold(x), scale_factor=2, mode="nearest")
            x = unfold(self.up(h), f)
        return x

    def params(self):
        p = {}
        for i in range(len(self.resnets)):
            p[f"resnets_{i}"] = self.resnets[i].params()
            if self.cross:
                p[f"attentions_{i}"] = self.attns[i].params()
            p[f"motion_modules_{i}"] = self.mms[i].params()
        if self.upsample:
            p["upsamplers_0"] = {"conv": conv(self.up)}
        return p


class TUNet3D(torch.nn.Module):
    """Full UNet3DConditionModelCamObjCond graph (unet.py:1033-1300 wiring):
    SD1.5 topology, motion modules everywhere (mid off), pose features at all
    4 scales into the temporal attention, traj features into the 3 cross-attn
    down blocks only."""

    def __init__(self, chs=(32, 64, 128, 128), heads=4, xdim=48, lora_rank=0,
                 pose_scale=1.0):
        super().__init__()
        temb_dim = chs[0] * 4
        self.chs = chs
        self.time_lin1 = torch.nn.Linear(chs[0], temb_dim)
        self.time_lin2 = torch.nn.Linear(temb_dim, temb_dim)
        self.conv_in = torch.nn.Conv2d(4, chs[0], 3, padding=1)
        ins = [chs[0]] + list(chs[:-1])
        self.downs = torch.nn.ModuleList([
            TDown(ins[i], chs[i], heads, xdim, temb_dim, lora_rank, pose_scale,
                  cross=i < 3, downsample=i < 3)
            for i in range(4)
        ])
        self.mid_r0 = TResnet(chs[-1], chs[-1], temb_dim)
        self.mid_attn = TSpatial(chs[-1], xdim, heads, lora_rank)
        self.mid_r1 = TResnet(chs[-1], chs[-1], temb_dim)
        # up block i: out = reversed(chs)[i]; 3 resnets each; skip channels
        # mirror the down outputs (computed below per SD1.5 skip bookkeeping)
        rev = list(reversed(chs))  # (128, 128, 64, 32)
        prev = [chs[-1]] + rev[:-1]
        skipch = {  # per up block, channels of the 3 popped skips (deep->shallow)
            0: [chs[3], chs[3], chs[2]],
            1: [chs[2], chs[2], chs[1]],
            2: [chs[1], chs[1], chs[0]],
            3: [chs[0], chs[0], chs[0]],
        }
        self.ups = torch.nn.ModuleList([
            TUp([(prev[i] if j == 0 else rev[i]) + skipch[i][j] for j in range(3)],
                rev[i], heads, xdim, temb_dim, lora_rank, pose_scale,
                cross=i > 0, upsample=i < 3)
            for i in range(4)
        ])
        self.conv_norm_out = torch.nn.GroupNorm(32, chs[0], eps=1e-5)
        self.conv_out = torch.nn.Conv2d(chs[0], 4, 3, padding=1)

    def forward(self, x, t, ctx, pose_feats, traj_feats):
        # x (b, f, 4, h, w); pose/traj lists of (b, f, c_i, h/2^i, w/2^i)
        b, f = x.shape[:2]
        half = self.chs[0] // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
        args = t.float()[:, None] * freqs[None]
        temb = torch.cat([torch.cos(args), torch.sin(args)], -1)  # flip_sin_to_cos
        temb = self.time_lin2(F.silu(self.time_lin1(temb)))
        temb_rep = temb.repeat_interleave(f, 0)
        ctx_rep = ctx.repeat_interleave(f, 0)

        x = unfold(self.conv_in(fold(x)), f)
        skips = [x]
        for i, blk in enumerate(self.downs):
            x, outs = blk(x, temb_rep, ctx_rep, pose_feats[i],
                          traj_feats[i] if i < 3 else None)
            skips.extend(outs)
        h = self.mid_r0(fold(x), temb_rep)
        h = self.mid_attn(h, ctx_rep)
        x = unfold(self.mid_r1(h, temb_rep), f)
        for i, blk in enumerate(self.ups):
            x = blk(x, skips, temb_rep, ctx_rep, pose_feats[-(i + 1)])
        assert not skips
        h = F.silu(self.conv_norm_out(fold(x)))
        return unfold(self.conv_out(h), f)

    def params(self):
        p = {
            "time_embedding": {"linear_1": dense(self.time_lin1),
                               "linear_2": dense(self.time_lin2)},
            "conv_in": conv(self.conv_in),
            "mid_block": {"resnets_0": self.mid_r0.params(),
                          "attentions_0": self.mid_attn.params(),
                          "resnets_1": self.mid_r1.params()},
            "conv_norm_out": norm(self.conv_norm_out),
            "conv_out": conv(self.conv_out),
        }
        for i in range(4):
            p[f"down_blocks_{i}"] = self.downs[i].params()
            p[f"up_blocks_{i}"] = self.ups[i].params()
        return p


def test_full_unet3d_matches_torch(rng):
    chs, heads, xdim, b, f, h, w = (32, 64, 128, 128), 4, 48, 1, 2, 16, 24
    lora_cfg, pose_scale = 8, 0.5  # divisor rule: per-layer rank = ch // 8
    tm = TUNet3D(chs, heads, xdim, lora_rank=0, pose_scale=pose_scale)
    # per-layer LoRA ranks follow the reference divisor rule — rebuild the
    # spatial attentions with their level's rank (hidden // cfg)
    for i, blk in enumerate(tm.downs):
        if blk.cross:
            blk.attns = torch.nn.ModuleList(
                [TSpatial(chs[i], xdim, heads, chs[i] // lora_cfg) for _ in range(2)])
    rev = list(reversed(chs))
    for i, blk in enumerate(tm.ups):
        if blk.cross:
            blk.attns = torch.nn.ModuleList(
                [TSpatial(rev[i], xdim, heads, rev[i] // lora_cfg) for _ in range(3)])
    tm.mid_attn = TSpatial(chs[-1], xdim, heads, chs[-1] // lora_cfg)

    x = rng.normal(size=(b, f, h, w, 4)).astype(np.float32)
    ctx = rng.normal(size=(b, 7, xdim)).astype(np.float32)
    t = np.array([321])
    pose = [rng.normal(size=(b, f, h // 2**i, w // 2**i, c)).astype(np.float32) * 0.3
            for i, c in enumerate(chs)]
    traj = [rng.normal(size=(b, f, h // 2**i, w // 2**i, c)).astype(np.float32) * 0.3
            for i, c in enumerate(chs)]

    with torch.no_grad():
        want = tm(
            torch.from_numpy(x).permute(0, 1, 4, 2, 3), torch.from_numpy(t),
            torch.from_numpy(ctx),
            [torch.from_numpy(p).permute(0, 1, 4, 2, 3) for p in pose],
            [torch.from_numpy(p).permute(0, 1, 4, 2, 3) for p in traj],
        ).permute(0, 1, 3, 4, 2).numpy()

    unet = UNet3D(
        block_out_channels=chs, attn_heads=heads, cross_attention_dim=xdim,
        use_motion_module=True, motion_num_heads=heads, camera_cond=True,
        pose_scale=pose_scale, lora_rank=lora_cfg,
    )
    got = unet.apply(
        {"params": tm.params()}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        pose_features=[jnp.asarray(p) for p in pose],
        traj_features=[jnp.asarray(p) for p in traj],
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)

    # the traj quirk is load-bearing: perturbing traj[3] (plain 4th block)
    # must NOT change the output (unet_cam_obj.py:1227-1234)
    traj_perturbed = [jnp.asarray(p) for p in traj[:3]] + [jnp.asarray(traj[3]) + 10.0]
    got2 = unet.apply(
        {"params": tm.params()}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        pose_features=[jnp.asarray(p) for p in pose], traj_features=traj_perturbed,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


class TVAEAttn(torch.nn.Module):
    """diffusers VAE mid-block attention: 1 head, qkv+proj WITH bias, c^-0.5."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = torch.nn.GroupNorm(32, c, eps=1e-6)
        self.to_q = torch.nn.Linear(c, c)
        self.to_k = torch.nn.Linear(c, c)
        self.to_v = torch.nn.Linear(c, c)
        self.to_out = torch.nn.Linear(c, c)

    def forward(self, x):
        n, c, h, w = x.shape
        y = self.group_norm(x).flatten(2).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        o = torch.softmax(q @ k.transpose(-1, -2) * c**-0.5, -1) @ v
        o = self.to_out(o)
        return o.transpose(1, 2).reshape(n, c, h, w) + x

    def params(self):
        return {"group_norm": norm(self.group_norm), "to_q": dense(self.to_q),
                "to_k": dense(self.to_k), "to_v": dense(self.to_v),
                "to_out": dense(self.to_out)}


class TVAE(torch.nn.Module):
    """diffusers AutoencoderKL topology at tiny width."""

    def __init__(self, chs=(32, 32, 64, 64), zc=4):
        super().__init__()
        self.chs, self.zc = chs, zc
        ins = [chs[0]] + list(chs[:-1])
        self.enc_conv_in = torch.nn.Conv2d(3, chs[0], 3, padding=1)
        self.enc_res = torch.nn.ModuleList()
        self.enc_down = torch.nn.ModuleList()
        for i, ch in enumerate(chs):
            self.enc_res.append(torch.nn.ModuleList(
                [TResnet(ins[i] if j == 0 else ch, ch) for j in range(2)]))
            if i != len(chs) - 1:
                self.enc_down.append(torch.nn.Conv2d(ch, ch, 3, stride=2, padding=1))
        self.enc_mid_r0 = TResnet(chs[-1], chs[-1])
        self.enc_mid_attn = TVAEAttn(chs[-1])
        self.enc_mid_r1 = TResnet(chs[-1], chs[-1])
        self.enc_norm_out = torch.nn.GroupNorm(32, chs[-1], eps=1e-6)
        self.enc_conv_out = torch.nn.Conv2d(chs[-1], 2 * zc, 3, padding=1)
        self.quant = torch.nn.Conv2d(2 * zc, 2 * zc, 1)

        rev = list(reversed(chs))
        self.post_quant = torch.nn.Conv2d(zc, zc, 1)
        self.dec_conv_in = torch.nn.Conv2d(zc, rev[0], 3, padding=1)
        self.dec_mid_r0 = TResnet(rev[0], rev[0])
        self.dec_mid_attn = TVAEAttn(rev[0])
        self.dec_mid_r1 = TResnet(rev[0], rev[0])
        rins = [rev[0]] + rev[:-1]
        self.dec_res = torch.nn.ModuleList()
        self.dec_up = torch.nn.ModuleList()
        for i, ch in enumerate(rev):
            self.dec_res.append(torch.nn.ModuleList(
                [TResnet(rins[i] if j == 0 else ch, ch) for j in range(3)]))
            if i != len(rev) - 1:
                self.dec_up.append(torch.nn.Conv2d(ch, ch, 3, padding=1))
        self.dec_norm_out = torch.nn.GroupNorm(32, rev[-1], eps=1e-6)
        self.dec_conv_out = torch.nn.Conv2d(rev[-1], 3, 3, padding=1)

    def encode_moments(self, x):
        x = self.enc_conv_in(x)
        for i in range(len(self.chs)):
            for r in self.enc_res[i]:
                x = r(x)
            if i != len(self.chs) - 1:
                x = self.enc_down[i](x)
        x = self.enc_mid_r1(self.enc_mid_attn(self.enc_mid_r0(x)))
        x = self.enc_conv_out(F.silu(self.enc_norm_out(x)))
        m = self.quant(x)
        mean, logvar = m.chunk(2, 1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode_raw(self, z):
        x = self.dec_conv_in(self.post_quant(z))
        x = self.dec_mid_r1(self.dec_mid_attn(self.dec_mid_r0(x)))
        for i in range(len(self.chs)):
            for r in self.dec_res[i]:
                x = r(x)
            if i != len(self.chs) - 1:
                x = F.interpolate(x, scale_factor=2, mode="nearest")
                x = self.dec_up[i](x)
        return self.dec_conv_out(F.silu(self.dec_norm_out(x)))

    def params(self):
        enc = {"conv_in": conv(self.enc_conv_in),
               "mid_block": {"resnets_0": self.enc_mid_r0.params(),
                             "attentions_0": self.enc_mid_attn.params(),
                             "resnets_1": self.enc_mid_r1.params()},
               "conv_norm_out": norm(self.enc_norm_out),
               "conv_out": conv(self.enc_conv_out)}
        for i in range(len(self.chs)):
            for j, r in enumerate(self.enc_res[i]):
                enc[f"down_blocks_{i}_resnets_{j}"] = r.params()
            if i != len(self.chs) - 1:
                enc[f"down_blocks_{i}_downsamplers_0"] = {"conv": conv(self.enc_down[i])}
        dec = {"conv_in": conv(self.dec_conv_in),
               "mid_block": {"resnets_0": self.dec_mid_r0.params(),
                             "attentions_0": self.dec_mid_attn.params(),
                             "resnets_1": self.dec_mid_r1.params()},
               "conv_norm_out": norm(self.dec_norm_out),
               "conv_out": conv(self.dec_conv_out)}
        for i in range(len(self.chs)):
            for j, r in enumerate(self.dec_res[i]):
                dec[f"up_blocks_{i}_resnets_{j}"] = r.params()
            if i != len(self.chs) - 1:
                dec[f"up_blocks_{i}_upsamplers_0"] = {"conv": conv(self.dec_up[i])}
        return {"encoder": enc, "decoder": dec,
                "quant_conv": conv(self.quant), "post_quant_conv": conv(self.post_quant)}


def test_full_vae_matches_torch(rng):
    chs = (32, 32, 64, 64)
    tm = TVAE(chs)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32).clip(-1, 1)
    z = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)

    with torch.no_grad():
        wm, wl = tm.encode_moments(torch.from_numpy(x).permute(0, 3, 1, 2))
        wdec = tm.decode_raw(torch.from_numpy(z).permute(0, 3, 1, 2))
    want_mean = wm.permute(0, 2, 3, 1).numpy()
    want_logvar = wl.permute(0, 2, 3, 1).numpy()
    want_dec = wdec.permute(0, 2, 3, 1).numpy()

    vae = AutoencoderKL(block_out_channels=chs)
    params = tm.params()
    gm, gl = vae.apply({"params": params}, jnp.asarray(x), method=vae.encode_moments)
    np.testing.assert_allclose(np.asarray(gm), want_mean, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gl), want_logvar, atol=1e-4, rtol=1e-3)

    # decode: ours takes scaled latents and divides the scaling factor
    gdec = vae.apply({"params": params}, jnp.asarray(z) * vae.scaling_factor,
                     method=vae.decode)
    np.testing.assert_allclose(np.asarray(gdec), want_dec, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------


class TCLIP(torch.nn.Module):
    """transformers CLIPTextModel topology: token+pos embed, pre-LN attention
    with causal mask, quick_gelu MLP, final LN; returns last_hidden_state."""

    def __init__(self, vocab=1000, c=64, layers=3, heads=4, max_pos=77):
        super().__init__()
        self.heads = heads
        self.tok = torch.nn.Embedding(vocab, c)
        self.pos = torch.nn.Parameter(torch.randn(max_pos, c) * 0.01)
        self.blocks = torch.nn.ModuleList()
        for _ in range(layers):
            self.blocks.append(torch.nn.ModuleDict({
                "ln1": torch.nn.LayerNorm(c),
                "q": torch.nn.Linear(c, c), "k": torch.nn.Linear(c, c),
                "v": torch.nn.Linear(c, c), "o": torch.nn.Linear(c, c),
                "ln2": torch.nn.LayerNorm(c),
                "fc1": torch.nn.Linear(c, c * 4), "fc2": torch.nn.Linear(c * 4, c),
            }))
        self.final_ln = torch.nn.LayerNorm(c)

    def forward(self, ids):
        b, s = ids.shape
        x = self.tok(ids) + self.pos[None, :s]
        causal = torch.triu(torch.full((s, s), torch.finfo(torch.float32).min), 1)
        for blk in self.blocks:
            h = blk["ln1"](x)
            c = h.shape[-1]
            d = c // self.heads
            q = blk["q"](h).reshape(b, s, self.heads, d).permute(0, 2, 1, 3)
            k = blk["k"](h).reshape(b, s, self.heads, d).permute(0, 2, 1, 3)
            v = blk["v"](h).reshape(b, s, self.heads, d).permute(0, 2, 1, 3)
            p = torch.softmax(q @ k.transpose(-1, -2) * d**-0.5 + causal, -1)
            o = (p @ v).permute(0, 2, 1, 3).reshape(b, s, c)
            x = x + blk["o"](o)
            h = blk["ln2"](x)
            h = blk["fc1"](h)
            h = h * torch.sigmoid(1.702 * h)  # quick_gelu
            x = x + blk["fc2"](h)
        return self.final_ln(x)

    def params(self):
        p = {"token_embedding": {"embedding": t2j(self.tok.weight)},
             "position_embedding": t2j(self.pos),
             "final_layer_norm": norm(self.final_ln)}
        for i, blk in enumerate(self.blocks):
            p[f"layers_{i}"] = {
                "layer_norm1": norm(blk["ln1"]),
                "self_attn": {"q_proj": dense(blk["q"]), "k_proj": dense(blk["k"]),
                              "v_proj": dense(blk["v"]), "out_proj": dense(blk["o"])},
                "layer_norm2": norm(blk["ln2"]),
                "mlp_fc1": dense(blk["fc1"]), "mlp_fc2": dense(blk["fc2"]),
            }
        return p


def test_clip_text_matches_torch(rng):
    tm = TCLIP()
    ids = rng.integers(0, 1000, size=(2, 12)).astype(np.int32)
    with torch.no_grad():
        want = tm(torch.from_numpy(ids).long()).numpy()

    clip = CLIPTextModel(vocab_size=1000, hidden_size=64, num_layers=3, num_heads=4)
    got = clip.apply({"params": tm.params()}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)

    # causal mask is load-bearing: changing a LATER token must not affect an
    # earlier position's embedding
    ids2 = ids.copy()
    ids2[:, -1] = (ids2[:, -1] + 7) % 1000
    got2 = clip.apply({"params": tm.params()}, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(got)[:, :-1], np.asarray(got2)[:, :-1],
                               atol=1e-6, rtol=1e-6)
