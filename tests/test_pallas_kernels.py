"""Pallas kernel correctness tests (interpret mode on the CPU mesh)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synfmc_tpu.ops.attention import _xla_attention
from synfmc_tpu.ops.flash_attention import flash_attention
from synfmc_tpu.ops.norms import group_norm
from synfmc_tpu.ops.pallas_groupnorm import fused_group_norm


@pytest.mark.parametrize(
    "b,sq,sk,h,d",
    [
        (2, 128, 128, 4, 40),   # spatial self-attn shape (head dim 40, padded)
        (1, 128, 77, 2, 64),    # cross-attn to text tokens
        (2, 100, 100, 2, 32),   # non-multiple seq (padding path)
        (3, 16, 16, 8, 160),    # temporal-ish, head dim > 128
    ],
)
def test_flash_forward_matches_xla(rng, b, sq, sk, h, d):
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, h, d)).astype(np.float32))
    scale = d**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale))
    got = np.asarray(flash_attention(q, k, v, scale, True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_block_q_budget():
    """Long sequences must shrink the q-block so the (BQ, Sk) fp32
    intermediates fit VMEM (512x768 serving = 6144 spatial tokens; the XLA
    fallback materializes B,H,S,S logits and OOMs HBM there)."""
    from synfmc_tpu.ops.flash_attention import _MAX_KV_SEQ, _pick_block_q, flash_supported

    kv6 = 2 * 6144 * 320 * 2   # bf16 K+V at the 512x768 shape
    kv16 = 2 * 16384 * 320 * 2  # 1024x1024
    assert _pick_block_q(1536) == 512          # tuned reference shapes: unchanged
    assert _pick_block_q(4096, 4096) == 512
    assert _pick_block_q(6144, 6144, kv_bytes=kv6) == 256   # measured optimum (PERF.md)
    assert _pick_block_q(6144, 6144, live=6, kv_bytes=kv6,
                         scratch_bytes=2 * 6144 * 320 * 4) <= 128  # bwd budget
    assert 8 <= _pick_block_q(16384, 16384, kv_bytes=kv16) <= 128
    assert _MAX_KV_SEQ >= 16384
    q = jnp.zeros((1, 6144, 8, 40))
    # gate accepts the 512x768 spatial shape on TPU backends; on this CPU
    # test mesh it reports False only because of the backend check
    assert flash_supported(q, q, q) == (jax.default_backend() == "tpu")


def test_flash_long_seq_interpret_matches_xla(rng):
    """Budgeted-block path (sk > 4096) numerics, interpret mode, small dims."""
    b, s, h, d = 1, 4608, 1, 8  # > 4096 triggers the budget cap
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    scale = d**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale))
    got = np.asarray(flash_attention(q, k, v, scale, True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_flash_backward_matches_xla(rng):
    b, s, h, d = 1, 64, 2, 40
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    scale = d**-0.5
    cot = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, True) * cot)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-3)


def test_flash_bf16(rng):
    b, s, h, d = 2, 128, 4, 80
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32)).astype(jnp.bfloat16)
    scale = d**-0.5
    got = flash_attention(q, k, v, scale, True)
    assert got.dtype == jnp.bfloat16
    want = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("act", [None, "silu"])
@pytest.mark.parametrize("c,groups", [(128, 32), (256, 32)])
def test_fused_group_norm_matches_xla(rng, act, c, groups):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    want = np.asarray(group_norm(x, scale, bias, groups, eps=1e-6, act=act, use_pallas=False))
    got = np.asarray(fused_group_norm(x, scale, bias, groups, 1e-6, act, True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_fused_group_norm_grads(rng):
    c, groups = 128, 32
    x = jnp.asarray(rng.normal(size=(1, 4, 8, c)).astype(np.float32))
    scale = jnp.ones((c,))
    bias = jnp.zeros((c,))

    f_pallas = lambda x, s, b: jnp.sum(fused_group_norm(x, s, b, groups, 1e-6, "silu", True) ** 2)
    f_xla = lambda x, s, b: jnp.sum(group_norm(x, s, b, groups, eps=1e-6, act="silu", use_pallas=False) ** 2)
    g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-3)


def test_flash_backward_packed_path(rng):
    """seq%8==0 routes through the packed-channel backward kernel."""
    b, s, h, d = 1, 128, 4, 40
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    scale = d**-0.5

    g_flash = jax.grad(lambda *a: jnp.sum(flash_attention(*a, scale, True) * cot), argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(lambda *a: jnp.sum(_xla_attention(*a, scale) * cot), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3)


def test_flash_backward_padded_fallback(rng):
    """odd seq (not %8) falls back to the transpose+pad backward."""
    b, s, h, d = 1, 60, 2, 40
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    scale = d**-0.5
    g_flash = jax.grad(lambda x: jnp.sum(flash_attention(x, x, x, scale, True) * cot))(q)
    g_xla = jax.grad(lambda x: jnp.sum(_xla_attention(x, x, x, scale) * cot))(q)
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_xla), atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# packed temporal attention
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n,f,h,d",
    [
        (64, 16, 8, 40),    # motion-module level-0 shape (N tiled)
        (32, 16, 8, 80),
        (16, 8, 4, 160),
        (24, 12, 6, 16),    # odd frame count / head count
    ],
)
def test_temporal_attention_matches_xla(rng, n, f, h, d):
    from synfmc_tpu.ops.temporal_attention import _fwd_call, _xla_ref

    c = h * d
    q = jnp.asarray(rng.normal(size=(n, f, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, f, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, f, c)).astype(np.float32))
    scale = d**-0.5
    got = np.asarray(_fwd_call(q, k, v, scale, h, interpret=True))
    want = np.asarray(_xla_ref(q, k, v, scale, h))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_temporal_attention_backward_matches_xla(rng):
    from synfmc_tpu.ops.temporal_attention import _xla_ref, temporal_attention

    n, f, h, d = 32, 16, 8, 40
    c = h * d
    q = jnp.asarray(rng.normal(size=(n, f, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, f, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, f, c)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, f, c)).astype(np.float32))
    scale = d**-0.5

    got = jax.grad(
        lambda q, k, v: jnp.sum(temporal_attention(q, k, v, scale, h, True) * g),
        argnums=(0, 1, 2),
    )(q, k, v)
    want = jax.grad(
        lambda q, k, v: jnp.sum(_xla_ref(q, k, v, scale, h) * g),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_temporal_route_in_dispatch(rng, monkeypatch):
    # dot_product_attention must fall back to XLA off-TPU and stay exact
    from synfmc_tpu.ops.attention import dot_product_attention

    b, s, h, d = 16, 16, 4, 24
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    out = dot_product_attention(q, k, v)
    want = np.asarray(_xla_attention(q, k, v, d**-0.5))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5, rtol=1e-4)
