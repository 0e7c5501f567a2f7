"""Host-side data loading: multiprocess workers + per-process sharding.

Replaces the reference's torch DataLoader(num_workers=8) + DistributedSampler
(train_cam_ctrl.py:334-366): each JAX process owns a round-robin shard of the
dataset (keyed on jax.process_index()); worker *processes* run the numpy/PIL
``__getitem__`` pipeline (it is pure-Python and PIL-heavy, so threads would
serialize on the GIL); a bounded result queue applies backpressure and the
parent reorders batches so iteration order is deterministic.

Workers never touch JAX: the dataset path is numpy-only, so the worker
children never initialize a device backend.  Each worker reseeds the
dataset's RNG from (seed, epoch, worker_id) — the analog of torch's
per-worker base_seed + worker_id.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import random
from typing import Callable, Iterator, Optional

import numpy as np


def _poison_jax_in_worker() -> None:
    """Make any JAX device access inside a data worker fail loudly.

    Workers are forked from a parent whose JAX runtime threads may be live —
    the documented deadlock hazard.  The dataset path is numpy-only by
    design, but that invariant was previously unenforced: a future call path
    touching JAX in a child would hang, not error.  Patch the backend entry
    points in the CHILD (fork → affects only this process) so a violation
    raises immediately instead.
    """
    import sys

    jax = sys.modules.get("jax")
    if jax is None:
        return

    def _raise(*_a, **_k):
        raise RuntimeError(
            "JAX used inside a data-loader worker (forked child). Dataset "
            "code must be numpy-only; move device work to the parent."
        )

    try:
        from jax._src import xla_bridge

        xla_bridge.backends = _raise
        xla_bridge.get_backend = _raise
        jax.devices = _raise
    except Exception:
        pass  # best-effort guard; internals may move across JAX versions


def _worker_loop(dataset, collate_fn, job_q, out_q, seed: int,
                 process_index: int = 0, worker_id: int = 0,
                 num_workers: int = 1) -> None:
    """Persistent worker: lives across epochs; jobs are
    (bi, batch_idx, epoch, gen).

    Sample content is a pure function of (dataset seed, epoch, index) — the
    dataset reseeds per item in ``__getitem__`` — so the worker only has to
    forward the job's epoch.  For datasets without ``set_epoch`` (plain
    test datasets), a legacy per-(host, epoch, worker) reseed of ``.rng``
    keeps their streams epoch-varying.
    """
    import os
    import signal

    # Reset inherited signal dispositions: the trainer installs a
    # preemption handler (SIGTERM -> checkpoint+exit) in the PARENT, and a
    # forked worker inheriting it becomes unkillable by Process.terminate()
    # — close() then hangs joining it at interpreter exit (observed: the
    # preemption e2e test leaked a training process that ran for an hour).
    # Workers are stateless; default-die on TERM, ignore ctrl-C (the parent
    # checkpoints and shuts the pool down cleanly).
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    signal.signal(signal.SIGINT, signal.SIG_IGN)

    _poison_jax_in_worker()
    # budget the native decoder's C++ threads so num_workers processes don't
    # oversubscribe the host during PNG-decode bursts (overridable by env)
    os.environ.setdefault(
        "SYNFMC_NATIVE_IO_THREADS",
        str(max(1, (os.cpu_count() or 1) // max(1, num_workers))),
    )
    cur_epoch = None
    while True:
        job = job_q.get()
        if job is None:
            return
        bi, batch_idx, epoch, gen = job
        if epoch != cur_epoch:
            cur_epoch = epoch
            if hasattr(dataset, "set_epoch"):
                dataset.set_epoch(epoch)
            elif hasattr(dataset, "rng") and isinstance(dataset.rng, random.Random):
                ws = np.random.SeedSequence((seed, process_index, epoch, worker_id))
                dataset.rng = random.Random(int(ws.generate_state(1)[0]))
        samples = [dataset[int(i)] for i in batch_idx]
        out_q.put((bi, gen, collate_fn(samples)))  # blocks when full: backpressure


class ShardedLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        drop_last: bool = True,
        mp_context: str = "fork",
    ):
        import jax

        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(0, num_workers)
        self.prefetch = max(1, prefetch)
        self.process_index = jax.process_index() if process_index is None else process_index
        self.process_count = jax.process_count() if process_count is None else process_count
        self.drop_last = drop_last
        self.mp_context = mp_context
        self.epoch = 0
        self.start_batch = 0
        self._gen = 0  # per-iterator generation tag (stale-result filtering)
        self._workers: list = []
        self._job_q = None
        self._out_q = None

    def set_epoch(self, epoch: int, start_batch: int = 0) -> None:
        """Per-epoch reshuffle (DistributedSampler.set_epoch parity,
        train_cam_ctrl.py:504-505).

        ``start_batch`` skips the first N batches of the epoch WITHOUT
        loading them — mid-epoch crash-resume continues the exact batch
        sequence of an uninterrupted run (the reference restores only the
        epoch counter and replays it, train_cam_ctrl.py:467-495).
        """
        self.epoch = epoch
        self.start_batch = start_batch

    def _epoch_indices(self, epoch: Optional[int] = None) -> np.ndarray:
        """Global permutation → stride-sliced per-host shard.

        DistributedSampler semantics (train_cam_ctrl.py:342): the shuffle
        seed is the GLOBAL seed (+epoch), identical on every host, so all
        hosts compute the same permutation and the stride slices partition
        the dataset (disjoint, complete).  A per-host seed here would make
        the shards overlap/omit samples.  Per-host randomness lives in the
        dataset/worker RNG only (seeded with + process_index below).
        """
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch if epoch is None else epoch))
            rng.shuffle(idx)
        return idx[self.process_index :: self.process_count]

    def _epoch_batches(self, epoch: Optional[int] = None) -> list[np.ndarray]:
        indices = self._epoch_indices(epoch)
        step = self.batch_size
        stop = len(indices) - (step - 1 if self.drop_last else 0)
        return [indices[i : i + step] for i in range(0, stop, step)]

    def __len__(self) -> int:
        return len(self._epoch_batches())

    def _ensure_workers(self) -> None:
        """Start the PERSISTENT worker pool (once; reused across epochs —
        per-epoch respawn wasted startup at small per-host epoch sizes)."""
        if self._workers:
            return
        # mp-context tradeoff (measured, not theoretical):
        #  - "fork" (default, = torch DataLoader on Linux): dataset ships by
        #    COW, no pickling, and — crucially — no __main__ re-import.  JAX
        #    warns that forking a multithreaded parent can deadlock; workers
        #    only run numpy/PIL code and never touch the device backend
        #    (enforced by _poison_jax_in_worker), the same posture every
        #    torch/CUDA training stack runs.
        #  - "forkserver"/"spawn": avoid the fork-from-threads hazard but
        #    RE-IMPORT ``__main__`` in the children (standard spawn-family
        #    semantics), so any driver script without an
        #    ``if __name__ == "__main__"`` guard re-executes itself — this
        #    bit us in practice (duplicated training runs, stalled workers).
        #    Opt in via mp_context= only when your entry script is guarded.
        ctx = mp.get_context(self.mp_context)
        if self.mp_context == "forkserver":
            ctx.set_forkserver_preload([])  # don't preload __main__ in the server
        self._job_q = ctx.Queue()
        self._out_q = ctx.Queue(maxsize=self.prefetch + self.num_workers)
        self._workers = [
            ctx.Process(
                target=_worker_loop,
                args=(self.dataset, self.collate_fn, self._job_q, self._out_q,
                      self.seed, self.process_index, w, self.num_workers),
                daemon=True,
            )
            for w in range(self.num_workers)
        ]
        for w in self._workers:
            w.start()

    def close(self) -> None:
        """Stop the worker pool (idempotent; also runs at GC)."""
        if not self._workers:
            return
        for _ in self._workers:
            try:
                self._job_q.put_nowait(None)
            except Exception:
                pass
        for w in self._workers:
            w.join(timeout=2)
            if w.is_alive():
                w.terminate()
                w.join(timeout=5)
        self._workers = []
        self._job_q = self._out_q = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def epochs(self, start_epoch: int = 0, start_batch: int = 0) -> Iterator[tuple[int, dict]]:
        """Infinite cross-epoch stream of ``(epoch, batch)`` with SEAMLESS
        epoch boundaries.

        ``__iter__`` dispatches one epoch's jobs and drains them, so every
        epoch boundary stalls the consumer for a full sample-build latency
        (measured 1.2–2.9 s spikes at full scale, PERF.md round 4).  Here
        jobs flow continuously: the next epoch's jobs are enqueued as soon
        as the in-flight window (num_workers + prefetch) has room, so
        workers never idle between epochs.  Batch sequence and content are
        IDENTICAL to repeated ``set_epoch + __iter__`` — content is a pure
        function of (seed, epoch, idx), and jobs carry their epoch.
        """
        if self.num_workers == 0:  # synchronous path
            ep, sb = start_epoch, start_batch
            while True:
                if hasattr(self.dataset, "set_epoch"):
                    self.dataset.set_epoch(ep)
                for batch_idx in self._epoch_batches(ep)[sb:]:
                    yield ep, self.collate_fn([self.dataset[int(i)] for i in batch_idx])
                ep, sb = ep + 1, 0

        self._ensure_workers()
        self._gen += 1
        gen = self._gen

        def jobs():
            ep, sb = start_epoch, start_batch
            while True:
                for batch_idx in self._epoch_batches(ep)[sb:]:
                    yield ep, batch_idx
                ep, sb = ep + 1, 0

        job_iter = jobs()
        window = self.num_workers + self.prefetch
        epochs_by_bi: dict[int, int] = {}
        next_bi = 0
        want = 0
        reorder: dict[int, dict] = {}
        while True:
            while next_bi - want < window:
                ep, batch_idx = next(job_iter)
                self._job_q.put((next_bi, batch_idx, ep, gen))
                epochs_by_bi[next_bi] = ep
                next_bi += 1
            while want not in reorder:
                try:
                    bi, g, batch = self._out_q.get(timeout=600)
                except queue.Empty:
                    dead = [w.exitcode for w in self._workers if not w.is_alive()]
                    raise RuntimeError(f"data workers stalled (exitcodes={dead})") from None
                if g != gen:
                    continue  # stale result from an abandoned earlier iterator
                reorder[bi] = batch
            yield epochs_by_bi.pop(want), reorder.pop(want)
            want += 1

    def __iter__(self) -> Iterator[dict]:
        batches = self._epoch_batches()[self.start_batch :]
        if self.num_workers == 0:  # synchronous path (debug / tiny tests)
            if hasattr(self.dataset, "set_epoch"):
                self.dataset.set_epoch(self.epoch)
            for batch_idx in batches:
                yield self.collate_fn([self.dataset[int(i)] for i in batch_idx])
            return

        self._ensure_workers()
        self._gen += 1
        gen = self._gen
        for bi, batch_idx in enumerate(batches):
            self._job_q.put((bi, batch_idx, self.epoch, gen))

        reorder: dict[int, dict] = {}
        for want in range(len(batches)):
            while want not in reorder:
                try:
                    bi, g, batch = self._out_q.get(timeout=600)
                except queue.Empty:
                    dead = [w.exitcode for w in self._workers if not w.is_alive()]
                    raise RuntimeError(
                        f"data workers stalled (exitcodes={dead})"
                    ) from None
                if g != gen:
                    continue  # stale result from an abandoned earlier iterator
                reorder[bi] = batch
            yield reorder.pop(want)
