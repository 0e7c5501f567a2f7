"""Device mesh + sharding helpers — the DP/FSDP replacement for the
reference's DDP/NCCL stack (SURVEY.md §2.6).

The reference wraps modules in DistributedDataParallel and relies on NCCL
all-reduce in backward (train_cam_ctrl.py:443-445); here the batch is sharded
over a ``data`` mesh axis and XLA inserts the gradient psum.  A second
``fsdp`` axis is reserved for optionally sharding parameters/optimizer state
(ZeRO-style) — at reference model scale (<2B) it stays size 1 by default.

Multi-host: ``jax.distributed.initialize()`` replaces init_process_group;
``jax.process_index() == 0`` replaces the rank-0 guards.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_data: Optional[int] = None, num_fsdp: int = 1, num_sp: int = 1,
                devices=None) -> Mesh:
    """Training mesh with ('data', 'fsdp', 'sp') axes.

    ``sp`` shards the FRAME axis of the batch during TRAINING (the serving
    analog lives in create_serving_mesh): activations — the thing that OOMs
    HBM at high resolution, PERF.md's 512x768 measurement — shrink by sp,
    while frame-local ops (conv/GN/spatial attention, ~90% of FLOPs) stay
    communication-free and GSPMD inserts the temporal-attention and gradient
    collectives.  The folded (b·f) spatial batch keeps a contiguous
    P('data','sp') partition iff each data shard holds ONE batch row, so use
    sp only with per-shard batch 1 (exactly the memory-bound case).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = devices.size // (num_fsdp * num_sp)
    assert num_data * num_fsdp * num_sp == devices.size, (
        f"{devices.size} devices cannot form a {num_data}x{num_fsdp}x{num_sp} mesh"
    )
    return Mesh(devices.reshape(num_data, num_fsdp, num_sp),
                axis_names=("data", "fsdp", "sp"))


def create_serving_mesh(num_data: Optional[int] = None, num_sp: int = 1, devices=None) -> Mesh:
    """Serving mesh with ('data', 'sp') axes.

    ``data`` shards independent batch members — for sequence-parallel serving
    the CFG pair rides this axis (see pipelines/animation.py:denoise_loop),
    so a single clip uses data=2.  ``sp`` shards the FRAME axis: every
    frame-local op (conv, GroupNorm, spatial attention — ~90% of the UNet's
    FLOPs) partitions with zero communication, and the temporal-attention
    collectives are synthesized by GSPMD from sharding constraints.  This is
    what lets ONE clip's generation scale across chips, which plain data
    parallelism cannot do.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = devices.size // num_sp
    assert num_data * num_sp == devices.size, (
        f"{devices.size} devices cannot form a {num_data}x{num_sp} serving mesh"
    )
    return Mesh(devices.reshape(num_data, num_sp), axis_names=("data", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, stacked: bool = False) -> Any:
    """Put a host batch onto the mesh, sharded on the leading batch axis.

    ``stacked=True`` is the gradient-accumulation layout: every leaf carries
    a leading MICRO axis (k, B, ...) that stays unsharded (each micro runs
    sequentially inside the step's fori_loop), and the data/sp rules below
    apply one axis deeper.

    Multi-process: ``batch`` is this process's LOCAL shard (per-host loading
    via ``local_shard_indices``); the global batch is the concatenation over
    processes, assembled with ``jax.make_array_from_process_local_data`` —
    ``device_put`` would treat the local batch as the global array.
    Replication (small arrays like ``null_ids``) is value-identical across
    processes, where plain ``device_put`` is multi-process-safe.
    """
    r = replicated(mesh)
    nsp = mesh.shape.get("sp", 1)
    nproc = jax.process_count()
    lead = 1 if stacked else 0  # index of the batch axis

    def put(x):
        x = np.asarray(x)
        shardable = x.ndim >= lead + 1 and (x.shape[lead] * nproc) % mesh.shape["data"] == 0
        if not shardable:
            return jax.device_put(x, r)
        # frame axis over 'sp' where it divides (pixels, masks, camera_rt,
        # intrinsics, obj_info all carry frames right after the batch axis;
        # token arrays like input_ids (B, 77) don't divide and stay data-only)
        spec = [None] * lead + ["data"]
        if nsp > 1 and x.ndim >= lead + 2 and x.shape[lead + 1] % nsp == 0:
            spec.append("sp")
        sh = NamedSharding(mesh, P(*spec))
        if nproc == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate params/optimizer state over the mesh."""
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def shard_over_fsdp(tree: Any, mesh: Mesh, min_size: int = 1024) -> Any:
    """ZeRO-1-style sharding: leaves split on their leading axis over the
    ``fsdp`` mesh axis where divisible (and big enough to be worth it),
    replicated otherwise.  Apply to trainable params AND optimizer state —
    Adam's mu/nu trees mirror the param shapes, so the same rule shards them
    identically, which is where the memory win is (SURVEY.md §2.6: "nearly
    free under pjit").

    With ``fsdp == 1`` this degenerates to plain replication (today's
    single-axis data-parallel behavior, bit-for-bit).

    Multi-process note: ``create_mesh`` lays devices out data-major, so with
    whole hosts per data slice the fsdp groups stay intra-host and rank-0
    checkpoint fetches remain fully addressable.
    """
    fsdp = mesh.shape.get("fsdp", 1)
    if fsdp == 1:
        return replicate(tree, mesh)
    sh_f = NamedSharding(mesh, P("fsdp"))
    sh_r = replicated(mesh)
    multiproc = jax.process_count() > 1

    def put(x):
        if not hasattr(x, "shape"):
            return x
        sh = sh_f if (x.ndim >= 1 and x.shape[0] % fsdp == 0 and x.size >= min_size) else sh_r
        if multiproc:
            # device_put requires fully-addressable shardings; every process
            # holds the full (identical) value, so slice it per device.
            xh = np.asarray(x)
            return jax.make_array_from_callback(xh.shape, sh, lambda idx: xh[idx])
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, tree)


def _norm_index(idx) -> tuple:
    """Hashable form of a shard index (tuple of slices)."""
    return tuple((s.start, s.stop, s.step) for s in idx)


def locally_coverable(x) -> bool:
    """True when this process's addressable shards cover every index of the
    array — i.e. ``x`` can be materialized on this host WITHOUT a collective.

    Distinct from ``is_fully_addressable`` (all shards local — false for any
    multi-process array) and ``is_fully_replicated``: a ZeRO-1 ``P('fsdp')``
    leaf on a process-spanning ``data`` axis is neither, yet every fsdp
    shard has a local replica when fsdp groups stay intra-process
    (create_mesh's data-major layout).
    """
    if not hasattr(x, "sharding") or not hasattr(x, "addressable_shards"):
        return True
    if x.is_fully_addressable or x.is_fully_replicated:
        return True
    index_map = x.sharding.devices_indices_map(x.shape)
    pidx = jax.process_index()
    local = {_norm_index(i) for d, i in index_map.items() if d.process_index == pidx}
    return local == {_norm_index(i) for i in index_map.values()}


def tree_locally_coverable(tree: Any) -> bool:
    return all(locally_coverable(x) for x in jax.tree_util.tree_leaves(tree))


def fetch_to_host(tree: Any) -> Any:
    """Materialize a pytree of (possibly sharded) arrays as host numpy.

    Works for every layout this repo produces, where a bare
    ``jax.device_get`` fails on multi-process ZeRO shardings (VERDICT r3
    weak #4 — a wrong layout used to fail at the first checkpoint step):

    - locally coverable leaves (incl. plain numpy, replicated, and
      intra-process fsdp) are assembled from addressable shards — no
      communication;
    - anything else falls back to a COLLECTIVE ``process_allgather``: every
      process must reach this call together (the trainer pre-gathers
      synchronously at checkpoint steps before handing off to the async
      writer, which keeps the per-process device program streams aligned).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if all(locally_coverable(x) for x in leaves):
        def assemble(x):
            if not hasattr(x, "addressable_shards") or x.is_fully_addressable:
                return np.asarray(jax.device_get(x)) if hasattr(x, "dtype") else x
            out = np.empty(x.shape, x.dtype)
            for s in x.addressable_shards:
                out[s.index] = np.asarray(s.data)
            return out

        return treedef.unflatten([assemble(x) for x in leaves])
    from jax.experimental import multihost_utils

    return jax.device_get(multihost_utils.process_allgather(tree, tiled=True))


def state_shardings(state: Any) -> Any:
    """Tree of the committed shardings of a (sharded) train state — used to
    pin ``jit`` output shardings so ZeRO sharding persists across steps
    instead of silently re-replicating."""
    return jax.tree_util.tree_map(
        lambda x: x.sharding if hasattr(x, "sharding") else None, state
    )


def is_main_process() -> bool:
    """Rank-0 guard (reference global_rank == 0 pattern)."""
    return jax.process_index() == 0


def sync_stop_flag(local: bool) -> bool:
    """Collective OR of a per-process stop flag.

    Preemption signals (SIGTERM) can land on ONE rank of a multi-host job, or
    on different step boundaries per rank; the training loop must break on
    the SAME step everywhere or the breaker's save-path collectives deadlock
    against the other ranks' train-step collectives.  Every process must call
    this at the same loop point (it is a collective).  Single-process runs
    return ``local`` with no collective at all.
    """
    if jax.process_count() == 1:
        return bool(local)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray([local], np.int32))
    return bool(np.asarray(flags).any())


def local_shard_indices(total: int) -> np.ndarray:
    """Per-host dataset shard (DistributedSampler replacement): this host's
    example indices, round-robin by process index."""
    return np.arange(jax.process_index(), total, jax.process_count())
