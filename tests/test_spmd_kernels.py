"""SPMD partitioning of the Pallas kernels (ops/spmd.py).

Without the custom_partitioning rules, a sharded jit treats pallas_call as an
opaque custom-call and REPLICATES its operands (measured: 21 all-gathers for
one batch-sharded flash_attention on this 8-device mesh — every device
materializes the global batch).  These tests pin the fixed behavior on the
virtual CPU mesh (kernels in interpret mode): zero collectives for the
shardable axes, targeted ones otherwise, and bit-level agreement with the
unsharded path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from synfmc_tpu.ops.attention import _xla_attention
from synfmc_tpu.ops.flash_attention import flash_attention
from synfmc_tpu.ops.temporal_attention import temporal_attention, _xla_ref


def _mesh(*shape_names):
    names = tuple(n for n, _ in shape_names)
    shape = tuple(s for _, s in shape_names)
    return Mesh(np.asarray(jax.devices()).reshape(shape), axis_names=names)


def _collective_count(fn, *args):
    hlo = jax.jit(fn).lower(*args).compile().as_text()
    return sum(hlo.count(c) for c in ("all-gather", "all-reduce", "collective-permute"))


def test_flash_fwd_batch_sharded_no_collectives(rng):
    mesh = _mesh(("data", 8))
    b, s, h, d = 8, 256, 4, 40
    q, k, v = (rng.normal(size=(b, s, h, d)).astype(np.float32) for _ in range(3))
    ref = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.125)

    sh = NamedSharding(mesh, P("data"))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    fn = lambda q, k, v: flash_attention(q, k, v, 0.125, True)
    assert _collective_count(fn, qd, kd, vd) == 0
    out = jax.jit(fn)(qd, kd, vd)
    # sharding propagates through: the result stays batch-sharded
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_fwd_head_and_2d_sharded(rng):
    mesh = _mesh(("data", 4), ("mdl", 2))
    b, s, h, d = 4, 64, 4, 16
    q, k, v = (rng.normal(size=(b, s, h, d)).astype(np.float32) for _ in range(3))
    ref = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.25)

    # batch x heads sharded together: still zero collectives
    sh = NamedSharding(mesh, P("data", None, "mdl"))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    fn = lambda q, k, v: flash_attention(q, k, v, 0.25, True)
    assert _collective_count(fn, qd, kd, vd) == 0
    out = jax.jit(fn)(qd, kd, vd)
    assert out.sharding.spec == P("data", None, "mdl")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_grad_batch_sharded_matches_replicated(rng):
    mesh = _mesh(("data", 8))
    b, s, h, d = 8, 64, 2, 16
    q, k, v = (rng.normal(size=(b, s, h, d)).astype(np.float32) for _ in range(3))
    cot = rng.normal(size=(b, s, h, d)).astype(np.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 0.25, True) * cot)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    sh = NamedSharding(mesh, P("data"))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    # the backward's b-axis shards freely too: no collectives in the whole vjp
    gfn = jax.grad(loss, argnums=(0, 1, 2))
    assert _collective_count(gfn, qd, kd, vd) == 0
    g_sh = jax.jit(gfn)(qd, kd, vd)
    for a, b_ in zip(g_sh, g_ref):
        assert a.sharding.spec == P("data")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_flash_seq_sharded_gathers_only_kv(rng):
    """A sequence-sharded q runs the fwd kernel per shard (q-blocks are
    independent); only K/V get gathered — not the whole world."""
    mesh = _mesh(("data", 8))
    b, s, h, d = 2, 256, 2, 16
    q, k, v = (rng.normal(size=(b, s, h, d)).astype(np.float32) for _ in range(3))
    ref = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.25)

    sh = NamedSharding(mesh, P(None, "data"))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    fn = jax.jit(lambda q, k, v: flash_attention(q, k, v, 0.25, True))
    out = fn(qd, kd, vd)
    assert out.sharding.spec == P(None, "data")  # q's sharding passes through
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_temporal_row_sharded_no_collectives(rng):
    mesh = _mesh(("data", 8))
    n, f, heads, d = 64, 8, 4, 16
    c = heads * d
    q, k, v = (rng.normal(size=(n, f, c)).astype(np.float32) for _ in range(3))
    ref = _xla_ref(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.25, heads)

    sh = NamedSharding(mesh, P("data"))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    fn = lambda q, k, v: temporal_attention(q, k, v, 0.25, heads, True)
    assert _collective_count(fn, qd, kd, vd) == 0
    out = jax.jit(fn)(qd, kd, vd)
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_temporal_grad_row_sharded_no_collectives(rng):
    """No cross-row accumulation in the temporal backward: the row axis
    shards through the WHOLE vjp with zero collectives."""
    mesh = _mesh(("data", 8))
    n, f, heads, d = 64, 8, 2, 16
    c = heads * d
    q, k, v = (rng.normal(size=(n, f, c)).astype(np.float32) for _ in range(3))
    cot = rng.normal(size=(n, f, c)).astype(np.float32)

    def loss(q, k, v):
        return jnp.sum(temporal_attention(q, k, v, 0.25, heads, True) * cot)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    sh = NamedSharding(mesh, P("data"))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    gfn = jax.grad(loss, argnums=(0, 1, 2))
    assert _collective_count(gfn, qd, kd, vd) == 0
    g_sh = jax.jit(gfn)(qd, kd, vd)
    for a, b_ in zip(g_sh, g_ref):
        assert a.sharding.spec == P("data")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_flash_fwd_merged_axes_batch_sharded(rng):
    """The serving fold (2B,F,...)->(2B*F,...) shards the merged leading dim
    over BOTH mesh axes — P(('data','sp')) on one dim must partition the
    kernel with zero collectives too (tuple factor assignment in _solve)."""
    mesh = _mesh(("data", 4), ("sp", 2))
    b, s, h, d = 8, 64, 2, 16
    q, k, v = (rng.normal(size=(b, s, h, d)).astype(np.float32) for _ in range(3))
    ref = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.25)

    sh = NamedSharding(mesh, P(("data", "sp")))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    fn = lambda q, k, v: flash_attention(q, k, v, 0.25, True)
    assert _collective_count(fn, qd, kd, vd) == 0
    out = jax.jit(fn)(qd, kd, vd)
    assert out.sharding.spec == P(("data", "sp"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_under_gspmd_partitioner(rng, monkeypatch):
    """The rules work under BOTH partitioners: force the legacy GSPMD path
    (infer_sharding_from_operands/partition callbacks instead of the Shardy
    sharding_rule) and re-check the zero-collective batch sharding."""
    import jax._src.config as jcfg

    if not hasattr(jcfg, "use_shardy_partitioner"):
        pytest.skip("no shardy toggle in this jax")
    mesh = _mesh(("data", 8))
    b, s, h, d = 8, 64, 2, 16
    q, k, v = (rng.normal(size=(b, s, h, d)).astype(np.float32) for _ in range(3))
    ref = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.25)
    sh = NamedSharding(mesh, P("data"))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    fn = lambda q, k, v: flash_attention(q, k, v, 0.25, True)
    with jcfg.use_shardy_partitioner(False):
        hlo = jax.jit(fn).lower(qd, kd, vd).compile().as_text()
        assert sum(hlo.count(c) for c in ("all-gather", "all-reduce", "collective-permute")) == 0
        out = jax.jit(fn)(qd, kd, vd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_spmd_gate_env_override(rng, monkeypatch):
    """SYNFMC_SPMD_KERNELS=0 keeps the plain (non-custom_partitioning)
    graph — the single-chip production path (ops/spmd.py) — and both paths
    agree numerically."""
    from synfmc_tpu.ops.spmd import spmd_kernels_enabled

    b, s, h, d = 2, 64, 2, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)

    def loss(q):
        return jnp.sum(flash_attention(q, q, q, 0.25, True) * cot)

    monkeypatch.setenv("SYNFMC_SPMD_KERNELS", "0")
    assert not spmd_kernels_enabled()
    out_plain = flash_attention(q, q, q, 0.25, True)
    g_plain = jax.grad(loss)(q)
    hlo = jax.jit(loss).lower(q).as_text()
    assert "CustomSPMDPartitioning" not in hlo

    monkeypatch.setenv("SYNFMC_SPMD_KERNELS", "1")
    assert spmd_kernels_enabled()
    out_cp = flash_attention(q, q, q, 0.25, True)
    g_cp = jax.grad(loss)(q)
    monkeypatch.delenv("SYNFMC_SPMD_KERNELS")
    assert spmd_kernels_enabled()  # 8 virtual devices -> on by default

    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_cp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_cp), atol=1e-6)


def test_kernels_still_work_unsharded(rng):
    """Single-device eager + jit paths are untouched by the partitioning
    rules (the unit suite's existing coverage runs through these)."""
    b, s, h, d = 2, 64, 2, 16
    q, k, v = (rng.normal(size=(b, s, h, d)).astype(np.float32) for _ in range(3))
    ref = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.25)
    out_eager = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.25, True)
    out_jit = jax.jit(lambda q, k, v: flash_attention(q, k, v, 0.25, True))(q, k, v)
    np.testing.assert_allclose(np.asarray(out_eager), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_jit), np.asarray(ref), atol=2e-5)


def test_flash_under_remat_sharded(rng):
    """jax.checkpoint over the sharded kernel (the training step remats the
    UNet blocks): primal replay + vjp must compile and stay collective-free
    on the batch axis."""
    mesh = _mesh(("data", 8))
    b, s, h, d = 8, 64, 2, 16
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    cot = rng.normal(size=(b, s, h, d)).astype(np.float32)

    @jax.checkpoint
    def block(q):
        return flash_attention(q, q, q, 0.25, True)

    def loss(q):
        return jnp.sum(block(q) * cot)

    g_ref = jax.grad(loss)(jnp.asarray(q))
    qd = jax.device_put(q, NamedSharding(mesh, P("data")))
    gfn = jax.grad(loss)
    assert _collective_count(gfn, qd) == 0
    g_sh = jax.jit(gfn)(qd)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), atol=3e-5)
