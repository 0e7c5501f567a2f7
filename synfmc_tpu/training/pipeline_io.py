"""Host-side training-loop overlap: input prefetch + async checkpointing.

The reference overlaps data loading with compute only through DataLoader
worker prefetch (train_cam_ctrl.py:334-366); the rest of its step —
tokenize/H2D/dispatch — rides the main thread, as did ours.  Measured on the
full-scale chip runs (PERF.md): device step 0.262 s vs 0.3–1.4 s host path.
These two helpers remove both serial host costs:

- ``ThreadPrefetcher``: a background thread stages batch N+1 (loader wait +
  tokenizer + device transfer) while the device executes step N.  JAX
  dispatch is already async — the HOST work is what serialized the loop.
- ``AsyncCheckpointWriter``: checkpoint writes (device→host fetch, Orbax
  serialization, torch-bundle export) run on a writer thread against an
  on-device SNAPSHOT of the train state, so a checkpoint step costs the main
  loop only the (async-dispatched) device-side copy.

Both are determinism-preserving: prefetch changes WHEN a batch is built,
never WHICH batch (sample content is a pure function of (seed, epoch, idx),
data/loader.py), and the snapshot is dispatched before the next step's
donation can touch the buffers.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp


class ThreadPrefetcher:
    """Wrap an iterator so ``next()`` overlaps with consumer compute.

    ``depth`` items are staged ahead by a daemon thread.  Exceptions raised
    by the source propagate to the consumer at the matching ``next()`` call.
    ``close()`` stops the thread promptly (it must be called when abandoning
    the iterator early, else the thread parks on a full queue holding
    references to the source).
    """

    _SENTINEL = object()

    def __init__(self, source: Iterator, depth: int = 1):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(source,), daemon=True, name="batch-prefetch"
        )
        self._thread.start()

    def _run(self, source: Iterator) -> None:
        try:
            for item in source:
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            self._q.put(self._SENTINEL)
        except BaseException as e:  # surface loader crashes at next()
            self._q.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self) -> None:
        self._stop.set()
        # unblock a producer parked on a full queue
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)


# One jitted program per pytree structure (jit caches): a python-level
# per-leaf jnp.copy would cost ~1 dispatch per leaf (~1600 for stage 2) —
# minutes over a high-latency device tunnel.  Note a bare jit(lambda t: t)
# would NOT copy (JAX returns passthrough outputs unexecuted); the explicit
# jnp.copy inside jit forces fresh output buffers.
_SNAPSHOT_FN = jax.jit(
    lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, tree
    )
)


def snapshot_on_device(state: Any) -> Any:
    """Device-side copy of a pytree, dispatched asynchronously.

    Checkpointing from the live train state would either block the loop on a
    device→host fetch or race the next step's buffer donation
    (``jit(..., donate_argnums=(0,))``).  A device-side copy is enqueued on
    the device stream BEFORE the next step, so it reads the pre-step values;
    the writer thread then fetches from the copy at leisure.
    """
    return _SNAPSHOT_FN(state)


def snapshot_fits_on_device(state: Any, headroom: float = 1.25) -> bool:
    """Whether a device-side snapshot of ``state`` fits in free HBM.

    At full stage-2 scale the train step already runs near the HBM limit
    (PERF.md: no-remat fits b=1 snugly); doubling the train state for the
    snapshot OOM'd the real chip (RESOURCE_EXHAUSTED at the first async
    checkpoint).  When it doesn't fit — or the backend cannot SAY whether it
    fits (the axon tunnel's memory_stats() is None; so is CPU's) — the
    trainer falls back to a blocking host fetch: serialization + disk still
    leave the hot loop, and the fetch runs between steps where it is safe.
    ``ckpt_device_snapshot: always`` overrides for backends known to have
    room.
    """
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        # the snapshot lives through the NEXT steps while the writer drains
        # it, so it must fit alongside the step's high-water mark, not the
        # between-steps usage (bytes_in_use between steps looked fine and
        # still OOM'd the real chip)
        used = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        if not limit or used is None:
            return False  # can't verify -> don't gamble a mid-run OOM
        need = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(state)
            if hasattr(x, "dtype")
        )
        return used + need * headroom < limit
    except Exception:
        return False


class AsyncCheckpointWriter:
    """Serialize checkpoint writes onto a single background thread.

    ``submit`` waits for the previous write (checkpoints must land in
    order; Orbax paths could also collide) then runs ``fn`` on a fresh
    daemon thread.  ``wait`` joins the in-flight write and re-raises any
    failure — call it before reading back a checkpoint and at train end.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def submit(self, fn: Callable[[], None]) -> None:
        self.wait()

        def run():
            try:
                fn()
            except BaseException as e:
                self._error = e

        self._thread = threading.Thread(target=run, daemon=True, name="ckpt-writer")
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err
