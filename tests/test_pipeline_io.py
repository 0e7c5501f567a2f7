"""Unit tests for the trainer's overlap machinery (training/pipeline_io.py):
prefetch ordering/exceptions/shutdown, snapshot semantics, writer error
surfacing.  The e2e bit-equality is in test_trainers.py; these pin the
corner cases a fixture run doesn't reach."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synfmc_tpu.training.pipeline_io import (
    AsyncCheckpointWriter,
    ThreadPrefetcher,
    snapshot_fits_on_device,
    snapshot_on_device,
)


def test_prefetcher_preserves_order_and_stops():
    src = iter(range(100))
    pf = ThreadPrefetcher(src, depth=3)
    assert [next(pf) for _ in range(10)] == list(range(10))
    pf.close()
    # producer thread must be gone promptly (not parked on a full queue)
    assert not pf._thread.is_alive()


def test_prefetcher_exhaustion_raises_stopiteration():
    pf = ThreadPrefetcher(iter([1, 2]), depth=2)
    assert next(pf) == 1 and next(pf) == 2
    with pytest.raises(StopIteration):
        next(pf)
    pf.close()


def test_prefetcher_propagates_source_exception():
    def boom():
        yield 1
        raise RuntimeError("loader died")

    pf = ThreadPrefetcher(boom(), depth=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="loader died"):
        next(pf)
    pf.close()


def test_prefetcher_overlaps_producer_with_consumer():
    """While the consumer holds item N, item N+1 must already be staged."""
    staged = []

    def src():
        for i in range(5):
            staged.append(i)
            yield i

    pf = ThreadPrefetcher(src(), depth=1)
    assert next(pf) == 0
    deadline = time.time() + 5
    while len(staged) < 2 and time.time() < deadline:
        time.sleep(0.01)
    assert len(staged) >= 2, "producer did not run ahead of the consumer"
    pf.close()


def test_snapshot_is_a_real_copy():
    state = {"a": jnp.arange(8.0), "b": jnp.ones((4, 4))}
    snap = snapshot_on_device(state)
    for k in state:
        np.testing.assert_array_equal(np.asarray(snap[k]), np.asarray(state[k]))
        # distinct buffers: deleting the original must not invalidate the copy
        assert snap[k] is not state[k]
    state["a"].delete()
    np.testing.assert_array_equal(np.asarray(snap["a"]), np.arange(8.0))


def test_snapshot_fits_is_conservative_without_stats():
    # CPU backends report no memory stats -> must refuse (the axon tunnel
    # does the same, and gambling OOM'd the real chip; PERF.md round 4)
    state = {"a": jnp.ones((4,))}
    assert snapshot_fits_on_device(state) in (False, True)
    if jax.local_devices()[0].memory_stats() is None:
        assert snapshot_fits_on_device(state) is False


def test_writer_serializes_and_raises_on_failure():
    order = []
    w = AsyncCheckpointWriter()
    ev = threading.Event()

    def slow():
        ev.wait(5)
        order.append("first")

    w.submit(slow)
    ev.set()
    w.submit(lambda: order.append("second"))  # must wait for `slow`
    w.wait()
    assert order == ["first", "second"]

    w.submit(lambda: (_ for _ in ()).throw(ValueError("disk full")))
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        w.wait()
    # error is cleared after being raised once
    w.wait()
