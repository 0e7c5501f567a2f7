"""Numerical parity tests for foundational layers vs torch (CPU) references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from synfmc_tpu.models.attention import Attention, SpatialTransformer
from synfmc_tpu.models.layers import (
    GroupNorm,
    LayerNorm,
    ResnetBlock2D,
    TimestepEmbedding,
    sinusoidal_positional_encoding,
    timestep_embedding,
)
from synfmc_tpu.models.motion_module import TemporalTransformer3D


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_group_norm_matches_torch(rng):
    n, h, w, c, g = 2, 6, 5, 32, 8
    x = rng.normal(size=(n, h, w, c)).astype(np.float32)
    scale = rng.normal(size=(c,)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)

    from synfmc_tpu.ops.norms import group_norm

    got = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), g, eps=1e-6))

    tgn = torch.nn.GroupNorm(g, c, eps=1e-6)
    with torch.no_grad():
        tgn.weight.copy_(torch.from_numpy(scale))
        tgn.bias.copy_(torch.from_numpy(bias))
    # torch is NCHW
    want = tgn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_group_norm_fused_silu(rng):
    from synfmc_tpu.ops.norms import group_norm

    x = rng.normal(size=(2, 4, 4, 16)).astype(np.float32)
    s = np.ones(16, np.float32)
    b = np.zeros(16, np.float32)
    base = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b), 4))
    fused = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b), 4, act="silu"))
    np.testing.assert_allclose(fused, base / (1 + np.exp(-base)), atol=1e-6)


def test_layer_norm_matches_torch(rng):
    x = rng.normal(size=(3, 7, 64)).astype(np.float32)
    scale = rng.normal(size=(64,)).astype(np.float32)
    bias = rng.normal(size=(64,)).astype(np.float32)

    from synfmc_tpu.ops.norms import layer_norm

    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    tln = torch.nn.LayerNorm(64)
    with torch.no_grad():
        tln.weight.copy_(torch.from_numpy(scale))
        tln.bias.copy_(torch.from_numpy(bias))
    np.testing.assert_allclose(got, tln(torch.from_numpy(x)).detach().numpy(), atol=1e-5)


def test_timestep_embedding_matches_diffusers_formula():
    # Independent re-derivation of diffusers get_timestep_embedding with
    # flip_sin_to_cos=True, freq_shift=0 (the SD1.5 unet setting, unet.py:112).
    dim = 320
    t = np.array([0.0, 1.0, 500.0, 999.0], dtype=np.float32)
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = t[:, None] * freqs[None, :]
    want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    got = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    # fp32 trig at large t*freq arguments vs fp64 reference
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sinusoidal_pe_matches_reference_loop():
    # Loop transcription of reference motion_module.py:303-321.
    d, max_len = 64, 32
    pe = np.zeros((max_len, d), dtype=np.float64)
    position = np.arange(max_len)[:, None]
    div_term = np.exp(np.arange(0, d, 2) * (-np.log(10000.0) / d))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    got = np.asarray(sinusoidal_positional_encoding(max_len, d))
    np.testing.assert_allclose(got, pe, atol=1e-5)


def _torch_resnet_block(in_c, out_c, temb_c, eps=1e-6, groups=32):
    """Hand-built torch module with diffusers ResnetBlock2D (default) semantics."""

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.GroupNorm(groups, in_c, eps=eps)
            self.conv1 = torch.nn.Conv2d(in_c, out_c, 3, padding=1)
            self.time_emb_proj = torch.nn.Linear(temb_c, out_c)
            self.norm2 = torch.nn.GroupNorm(groups, out_c, eps=eps)
            self.conv2 = torch.nn.Conv2d(out_c, out_c, 3, padding=1)
            self.conv_shortcut = torch.nn.Conv2d(in_c, out_c, 1) if in_c != out_c else None

        def forward(self, x, temb):
            h = torch.nn.functional.silu(self.norm1(x))
            h = self.conv1(h)
            h = h + self.time_emb_proj(torch.nn.functional.silu(temb))[:, :, None, None]
            h = torch.nn.functional.silu(self.norm2(h))
            h = self.conv2(h)
            if self.conv_shortcut is not None:
                x = self.conv_shortcut(x)
            return x + h

    return Block()


def _port_conv(params, tmod):
    """torch Conv2d -> flax Conv params (OIHW -> HWIO)."""
    return {
        "kernel": jnp.asarray(tmod.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(tmod.bias.detach().numpy()),
    }


def _port_dense(tmod):
    return {
        "kernel": jnp.asarray(tmod.weight.detach().numpy().T),
        "bias": jnp.asarray(tmod.bias.detach().numpy()),
    }


def _port_norm(tmod):
    return {
        "scale": jnp.asarray(tmod.weight.detach().numpy()),
        "bias": jnp.asarray(tmod.bias.detach().numpy()),
    }


def test_resnet_block_matches_torch(rng):
    in_c, out_c, temb_c = 32, 64, 128
    x = rng.normal(size=(2, 8, 8, in_c)).astype(np.float32)
    temb = rng.normal(size=(2, temb_c)).astype(np.float32)

    tblock = _torch_resnet_block(in_c, out_c, temb_c)
    want = (
        tblock(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(temb))
        .permute(0, 2, 3, 1)
        .detach()
        .numpy()
    )

    block = ResnetBlock2D(out_channels=out_c)
    params = {
        "norm1": _port_norm(tblock.norm1),
        "conv1": _port_conv(None, tblock.conv1),
        "time_emb_proj": _port_dense(tblock.time_emb_proj),
        "norm2": _port_norm(tblock.norm2),
        "conv2": _port_conv(None, tblock.conv2),
        "conv_shortcut": _port_conv(None, tblock.conv_shortcut),
    }
    got = np.asarray(block.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def _torch_attention(q_dim, kv_dim, heads, dim_head):
    """Reference AttnProcessor math (attention_processor.py:15-82) in torch."""

    class Attn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            inner = heads * dim_head
            self.to_q = torch.nn.Linear(q_dim, inner, bias=False)
            self.to_k = torch.nn.Linear(kv_dim, inner, bias=False)
            self.to_v = torch.nn.Linear(kv_dim, inner, bias=False)
            self.to_out = torch.nn.Linear(inner, q_dim)

        def forward(self, x, ctx=None):
            ctx = x if ctx is None else ctx
            q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)

            def split(t):
                b, s, _ = t.shape
                return t.reshape(b, s, heads, dim_head).permute(0, 2, 1, 3)

            q, k, v = split(q), split(k), split(v)
            probs = torch.softmax(q @ k.transpose(-1, -2) * dim_head**-0.5, dim=-1)
            out = (probs @ v).permute(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], -1)
            return self.to_out(out)

    return Attn()


def test_attention_matches_torch(rng):
    q_dim, kv_dim, heads, dim_head = 64, 96, 4, 16
    x = rng.normal(size=(2, 10, q_dim)).astype(np.float32)
    ctx = rng.normal(size=(2, 7, kv_dim)).astype(np.float32)

    tattn = _torch_attention(q_dim, kv_dim, heads, dim_head)
    want = tattn(torch.from_numpy(x), torch.from_numpy(ctx)).detach().numpy()

    attn = Attention(heads=heads, dim_head=dim_head, cross_attention_dim=kv_dim)
    params = {
        "to_q": {"kernel": t2j(tattn.to_q.weight).T},
        "to_k": {"kernel": t2j(tattn.to_k.weight).T},
        "to_v": {"kernel": t2j(tattn.to_v.weight).T},
        "to_out": _port_dense(tattn.to_out),
    }
    got = np.asarray(attn.apply({"params": params}, jnp.asarray(x), encoder_hidden_states=jnp.asarray(ctx)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pose_merge_zero_init_is_identity_conditioning(rng):
    """Zero-init qkv_merge => pose-conditioned attention == vanilla attention
    (reference attention_processor.py:189-192: merge starts at zero)."""
    dim, heads, dim_head = 64, 4, 16
    x = jnp.asarray(rng.normal(size=(2, 16, dim)).astype(np.float32))
    pose = jnp.asarray(rng.normal(size=(2, 16, dim)).astype(np.float32))

    key = jax.random.PRNGKey(0)
    plain = Attention(heads=heads, dim_head=dim_head)
    pv = plain.init(key, x)
    cond = Attention(heads=heads, dim_head=dim_head, pose_cond="qkv")
    cv = cond.init(key, x, pose_feature=pose)
    # Graft the plain projection weights into the conditioned module.
    cparams = dict(cv["params"])
    for name in ("to_q", "to_k", "to_v", "to_out"):
        cparams[name] = pv["params"][name]
    out_plain = plain.apply(pv, x)
    out_cond = cond.apply({"params": cparams}, x, pose_feature=pose)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_cond), atol=1e-6)

    # Perturb the merge kernel -> outputs must diverge.
    cparams["qkv_merge"] = {
        "kernel": jnp.ones_like(cv["params"]["qkv_merge"]["kernel"]) * 0.01,
        "bias": cv["params"]["qkv_merge"]["bias"],
    }
    out_pert = cond.apply({"params": cparams}, x, pose_feature=pose)
    assert np.abs(np.asarray(out_pert) - np.asarray(out_plain)).max() > 1e-4


def test_lora_zero_at_init(rng):
    dim, heads, dim_head = 64, 4, 16
    x = jnp.asarray(rng.normal(size=(2, 8, dim)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    plain = Attention(heads=heads, dim_head=dim_head)
    lora = Attention(heads=heads, dim_head=dim_head, lora_rank=8)
    pv = plain.init(key, x)
    lv = lora.init(key, x)
    lparams = dict(lv["params"])
    for name in ("to_q", "to_k", "to_v", "to_out"):
        lparams[name] = pv["params"][name]
    np.testing.assert_allclose(
        np.asarray(plain.apply(pv, x)),
        np.asarray(lora.apply({"params": lparams}, x)),
        atol=1e-6,
    )


def test_spatial_transformer_shapes(rng):
    x = jnp.asarray(rng.normal(size=(4, 8, 12, 64)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(4, 77, 96)).astype(np.float32))
    st = SpatialTransformer(heads=4, dim_head=16, cross_attention_dim=96)
    v = st.init(jax.random.PRNGKey(0), x, ctx)
    out = st.apply(v, x, ctx)
    assert out.shape == x.shape


def test_temporal_transformer_shapes_and_zero_init(rng):
    b, f, h, w, c = 2, 8, 4, 6, 64
    x = jnp.asarray(rng.normal(size=(b, f, h, w, c)).astype(np.float32))
    mm = TemporalTransformer3D(num_attention_heads=4, zero_initialize=True, temporal_pe_max_len=32)
    v = mm.init(jax.random.PRNGKey(0), x)
    out = mm.apply(v, x)
    assert out.shape == x.shape
    # zero-initialized proj_out => module is the identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_temporal_transformer_pose_conditioning(rng):
    b, f, h, w, c = 1, 4, 3, 3, 64
    x = jnp.asarray(rng.normal(size=(b, f, h, w, c)).astype(np.float32))
    pose = jnp.asarray(rng.normal(size=(b, f, h, w, c)).astype(np.float32))
    mm = TemporalTransformer3D(num_attention_heads=4, pose_cond_blocks=(0,))
    v = mm.init(jax.random.PRNGKey(0), x, pose_feature=pose)
    out = mm.apply(v, x, pose_feature=pose)
    assert out.shape == x.shape
    # zero-init merge: pose is inert at init
    out_nopose = mm.apply(v, x, pose_feature=jnp.zeros_like(pose))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_nopose), atol=1e-6)
