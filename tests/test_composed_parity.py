"""Composed-module numerical parity vs torch transcriptions.

These re-implement the reference composites (diffusers Transformer2DModel and
the AnimateDiff TemporalTransformer3DModel) in torch inside the test, port the
weights, and require elementwise agreement — the strongest parity check
available without the real SD1.5/AnimateDiff checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from synfmc_tpu.models.attention import SpatialTransformer
from synfmc_tpu.models.motion_module import TemporalTransformer3D


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def dense(m):
    p = {"kernel": t2j(m.weight).T}
    if m.bias is not None:
        p["bias"] = t2j(m.bias)
    return p


def conv(m):
    return {"kernel": jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": t2j(m.bias)}


def norm(m):
    return {"scale": t2j(m.weight), "bias": t2j(m.bias)}


class TorchSelfAttn(torch.nn.Module):
    """diffusers Attention math (q/k/v no bias, to_out linear+identity dropout)."""

    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = torch.nn.Linear(dim, dim, bias=False)
        self.to_k = torch.nn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_v = torch.nn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_out = torch.nn.Linear(dim, dim)

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, c = x.shape
        d = c // self.heads
        q = self.to_q(x).reshape(b, s, self.heads, d).permute(0, 2, 1, 3)
        k = self.to_k(ctx).reshape(b, ctx.shape[1], self.heads, d).permute(0, 2, 1, 3)
        v = self.to_v(ctx).reshape(b, ctx.shape[1], self.heads, d).permute(0, 2, 1, 3)
        p = torch.softmax(q @ k.transpose(-1, -2) * d**-0.5, -1)
        o = (p @ v).permute(0, 2, 1, 3).reshape(b, s, c)
        return self.to_out(o)


class TorchGEGLU(torch.nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = torch.nn.Linear(dim, dim * 8)
        self.out = torch.nn.Linear(dim * 4, dim)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, -1)
        return self.out(h * torch.nn.functional.gelu(gate))


class TorchSpatialTransformer(torch.nn.Module):
    """diffusers Transformer2DModel (use_linear_projection=False, depth 1)."""

    def __init__(self, c, ctx_dim, heads):
        super().__init__()
        self.norm = torch.nn.GroupNorm(32, c, eps=1e-6)
        self.proj_in = torch.nn.Conv2d(c, c, 1)
        self.norm1 = torch.nn.LayerNorm(c)
        self.attn1 = TorchSelfAttn(c, None, heads)
        self.norm2 = torch.nn.LayerNorm(c)
        self.attn2 = TorchSelfAttn(c, ctx_dim, heads)
        self.norm3 = torch.nn.LayerNorm(c)
        self.ff = TorchGEGLU(c)
        self.proj_out = torch.nn.Conv2d(c, c, 1)

    def forward(self, x, ctx):  # x NCHW
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.flatten(2).transpose(1, 2)  # (b, hw, c)
        y = y + self.attn1(self.norm1(y))
        y = y + self.attn2(self.norm2(y), ctx)
        y = y + self.ff(self.norm3(y))
        y = y.transpose(1, 2).reshape(b, c, h, w)
        return self.proj_out(y) + res


def test_spatial_transformer_matches_torch(rng):
    c, heads, ctx_dim = 64, 4, 48
    tmod = TorchSpatialTransformer(c, ctx_dim, heads)
    x = rng.normal(size=(2, 8, 12, c)).astype(np.float32)
    ctx = rng.normal(size=(2, 7, ctx_dim)).astype(np.float32)
    want = (
        tmod(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(ctx))
        .permute(0, 2, 3, 1).detach().numpy()
    )

    st = SpatialTransformer(heads=heads, dim_head=c // heads, cross_attention_dim=ctx_dim)
    params = {
        "norm": norm(tmod.norm),
        "proj_in": conv(tmod.proj_in),
        "proj_out": conv(tmod.proj_out),
        "blocks_0": {
            "norm1": norm(tmod.norm1),
            "attn1": {"to_q": dense(tmod.attn1.to_q), "to_k": dense(tmod.attn1.to_k),
                      "to_v": dense(tmod.attn1.to_v), "to_out": dense(tmod.attn1.to_out)},
            "norm2": norm(tmod.norm2),
            "attn2": {"to_q": dense(tmod.attn2.to_q), "to_k": dense(tmod.attn2.to_k),
                      "to_v": dense(tmod.attn2.to_v), "to_out": dense(tmod.attn2.to_out)},
            "norm3": norm(tmod.norm3),
            "ff": {"net_0_proj": dense(tmod.ff.proj), "net_2": dense(tmod.ff.out)},
        },
    }
    got = np.asarray(st.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


class TorchTemporalPE(torch.nn.Module):
    """reference PositionalEncoding (motion_module.py:303-321)."""

    def __init__(self, d, max_len=32):
        super().__init__()
        import math

        pos = torch.arange(max_len).unsqueeze(1)
        div = torch.exp(torch.arange(0, d, 2) * (-math.log(10000.0) / d))
        pe = torch.zeros(1, max_len, d)
        pe[0, :, 0::2] = torch.sin(pos * div)
        pe[0, :, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe)

    def forward(self, x):
        return x + self.pe[:, : x.size(1)]


class TorchTemporalTransformer(torch.nn.Module):
    """reference TemporalTransformer3DModel (motion_module.py:93-234),
    1 block x 2 Temporal_Self attentions, GN over frames-folded input."""

    def __init__(self, c, heads, max_len=32):
        super().__init__()
        self.norm = torch.nn.GroupNorm(32, c, eps=1e-6)
        self.proj_in = torch.nn.Linear(c, c)
        self.attns = torch.nn.ModuleList([TorchSelfAttn(c, None, heads) for _ in range(2)])
        self.norms = torch.nn.ModuleList([torch.nn.LayerNorm(c) for _ in range(2)])
        self.pes = torch.nn.ModuleList([TorchTemporalPE(c, max_len) for _ in range(2)])
        self.ff_norm = torch.nn.LayerNorm(c)
        self.ff = TorchGEGLU(c)
        self.proj_out = torch.nn.Linear(c, c)

    def forward(self, x):  # x (b, c, f, h, w)
        b, c, f, h, w = x.shape
        res = x
        y = self.norm(x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w))
        y = y.reshape(b, f, c, h, w).permute(0, 3, 4, 1, 2).reshape(b * h * w, f, c)
        y = self.proj_in(y)
        for attn, ln, pe in zip(self.attns, self.norms, self.pes):
            hidden = pe(ln(y))  # norm then PE (motion_module.py:288-295, 355-356)
            y = attn(hidden) + y
        y = self.ff(self.ff_norm(y)) + y
        y = self.proj_out(y)
        y = y.reshape(b, h, w, f, c).permute(0, 4, 3, 1, 2)
        return y + res


def test_temporal_transformer_matches_torch(rng):
    c, heads, b, f, h, w = 64, 4, 1, 4, 3, 5
    tmod = TorchTemporalTransformer(c, heads)
    x = rng.normal(size=(b, f, h, w, c)).astype(np.float32)
    want = (
        tmod(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
        .permute(0, 2, 3, 4, 1).detach().numpy()
    )

    mm = TemporalTransformer3D(num_attention_heads=heads, temporal_pe_max_len=32)
    blk = {
        "ff_norm": norm(tmod.ff_norm),
        "ff": {"net_0_proj": dense(tmod.ff.proj), "net_2": dense(tmod.ff.out)},
    }
    for i in range(2):
        blk[f"norms_{i}"] = norm(tmod.norms[i])
        blk[f"attention_blocks_{i}"] = {
            "to_q": dense(tmod.attns[i].to_q), "to_k": dense(tmod.attns[i].to_k),
            "to_v": dense(tmod.attns[i].to_v), "to_out": dense(tmod.attns[i].to_out),
        }
    params = {
        "norm": norm(tmod.norm),
        "proj_in": dense(tmod.proj_in),
        "proj_out": dense(tmod.proj_out),
        "transformer_blocks_0": blk,
    }
    got = np.asarray(mm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
