"""SPMD partitioning rules for the Pallas kernels.

Under a sharded jit, both partitioners (Shardy and GSPMD) treat a
``pallas_call`` as an opaque custom-call with unknown semantics and fall back
to REPLICATING its operands: measured on an 8-device mesh, one batch-sharded
``flash_attention`` call compiled to 21 all-gathers — every chip materializes
the full global batch, then throws 7/8 of its work away.  On a real multi-chip
TPU that turns the attention hot path into an ICI-bound broadcast.

``jax.experimental.custom_partitioning`` fixes this at the source: each kernel
declares an einsum-like factor rule ("b s h d, b t h d, b t h d -> b s h d")
plus the factors that must be replicated per-shard (the attention K/V sequence
``t``, the lane-sliced head_dim ``d``), and the partitioner then runs the SAME
Pallas kernel per shard on local data — batch/head sharding costs zero
collectives, and a sequence-sharded operand produces exactly one targeted
all-gather instead of gathering everything.

``shard_by_rule`` below is the shared scaffold: it parses the rule once and
derives concrete per-call shardings by assigning each free factor the mesh
axes of the first operand that arrives sharded on it (first-wins also
resolves cross-operand conflicts — an axis already claimed by another factor
stays unclaimed rather than producing an invalid duplicate PartitionSpec).
Factors in ``need_replication`` always lower to ``None`` (replicated), which
is what makes the per-shard kernel correct without any in-kernel collectives.

Works under both partitioners: the rule string feeds Shardy (the default),
``infer_sharding_from_operands``/``partition`` feed GSPMD, and both paths
share ``_solve``.  Single-device jit and eager calls pass straight through.
"""

from __future__ import annotations

import os

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["shard_by_rule", "spmd_kernels_enabled"]


def spmd_kernels_enabled() -> bool:
    """Route kernels through their custom_partitioning wrappers?

    True whenever the process has more than one device — the wrappers are
    what keeps the kernels sharded there.  On a single device they change
    nothing semantically and win nothing, but they DO add compile-time
    partitioner round-trips (CustomSPMDPartitioning Python callbacks) and
    swap in a graph different from the one every single-chip perf number in
    PERF.md was measured on — so single-device runs keep the plain
    custom-call graph bit-for-bit.  ``SYNFMC_SPMD_KERNELS=0/1`` overrides
    for A/B measurement.
    """
    env = os.environ.get("SYNFMC_SPMD_KERNELS")
    if env is not None:
        return env == "1"
    return jax.device_count() > 1


def _parse(rule: str):
    ops, res = rule.split("->")
    op_maps = tuple(tuple(s.split()) for s in ops.split(","))
    res_maps = tuple(tuple(s.split()) for s in res.split(","))
    return op_maps, res_maps


def _first_appearance_order(rule_factors, subset):
    """Shardy's MLIR verifier requires special-factor indices sorted by the
    factor's first appearance in the rule; order ours accordingly."""
    order = []
    for f in rule_factors:
        if f not in order:
            order.append(f)
    return tuple(sorted(subset, key=order.index))


def shard_by_rule(rule: str, need_replication=(), static_argnums=()):
    """Wrap a kernel-calling function in ``custom_partitioning``.

    Args:
      rule: einsum-like factor rule over the ARRAY arguments/results, e.g.
        ``"b s h d, b t h d, b t h d -> b s h d"``.  One factor name per dim.
      need_replication: factor names that must be fully replicated inside one
        shard (reductions/lane slices the kernel performs locally).
      static_argnums: positions of non-array (static) arguments of the
        wrapped function, exactly as for ``custom_partitioning``.

    Returns a decorator producing the partitioned callable (same signature).
    """
    op_maps, res_maps = _parse(rule)
    multi_out = len(res_maps) > 1
    all_factors = [f for m in op_maps + res_maps for f in m]
    need_repl = _first_appearance_order(all_factors, tuple(need_replication))
    statics = tuple(sorted(static_argnums))

    def _solve(mesh, arg_shapes):
        """Assign mesh axes to free factors from the operand shardings."""
        assigned, used = {}, set()
        for mapping, shape in zip(op_maps, arg_shapes):
            spec = getattr(getattr(shape, "sharding", None), "spec", None)
            if spec is None:
                continue
            for dim, f in enumerate(mapping):
                if f in need_repl or f in assigned or dim >= len(spec):
                    continue
                ax = spec[dim]
                if ax is None:
                    continue
                axs = ax if isinstance(ax, tuple) else (ax,)
                if any(a in used for a in axs):
                    continue
                assigned[f] = ax
                used.update(axs)

        def sh(mapping):
            return NamedSharding(mesh, P(*[assigned.get(f) for f in mapping]))

        in_sh = tuple(sh(m) for m in op_maps)
        out_sh = tuple(sh(m) for m in res_maps)
        return in_sh, (out_sh if multi_out else out_sh[0])

    def deco(fn):
        cp = custom_partitioning(fn, static_argnums=statics)
        n_static = len(statics)

        def partition(*args):
            static_vals, (mesh, arg_shapes, _result_shape) = args[:n_static], args[n_static:]
            in_sh, out_sh = _solve(mesh, arg_shapes)

            def lower_fn(*operands):
                # statics back into their original positions
                full, oi, si = [], iter(operands), iter(static_vals)
                for pos in range(len(operands) + n_static):
                    full.append(next(si) if pos in statics else next(oi))
                return fn(*full)

            return mesh, lower_fn, out_sh, in_sh

        def infer(*args):
            _static_vals, (mesh, arg_shapes, _result_shape) = args[:n_static], args[n_static:]
            return _solve(mesh, arg_shapes)[1]

        cp.def_partition(
            partition=partition,
            infer_sharding_from_operands=infer,
            sharding_rule=rule,
            need_replication_factors=need_repl,
        )
        return cp

    return deco
