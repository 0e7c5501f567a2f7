"""MicroBatcher unit tests (synfmc_tpu/serving/batcher.py): coalescing,
key separation, bucketing, error propagation, shutdown.  The numerical
batch-invariance that makes batching safe is pinned in
tests/test_pipeline.py::test_pipeline_batch_invariance; the HTTP e2e is in
tests/test_serve.py."""

import threading
import time

import pytest

from synfmc_tpu.serving.batcher import Job, MicroBatcher, bucket_size


def _job(prompt="p", seed=0, f=4, steps=2, guidance=8.0):
    return Job(prompts=[prompt], seed=seed, camera_txt=None,
               video_length=f, steps=steps, guidance=guidance)


def test_bucket_size():
    assert [bucket_size(n, 8) for n in (1, 2, 3, 4, 5, 8)] == [1, 2, 4, 4, 8, 8]
    assert bucket_size(3, 2) == 3  # never below n, even past the cap
    assert bucket_size(1, 1) == 1


def test_batcher_coalesces_queued_same_key_jobs():
    groups = []
    release = threading.Event()

    def run_group(jobs, key):
        if not groups:  # hold the FIRST group so followers queue up
            release.wait(5)
        groups.append([j.prompts[0] for j in jobs])
        return [f"out-{j.prompts[0]}" for j in jobs]

    b = MicroBatcher(run_group, max_batch=4)
    results = {}

    def call(name, **kw):
        results[name] = b.submit(_job(name, **kw))

    threads = [threading.Thread(target=call, args=(f"a{i}",)) for i in range(4)]
    threads[0].start()
    time.sleep(0.2)  # a0 is now held inside run_group
    for t in threads[1:]:
        t.start()
    time.sleep(0.2)  # a1..a3 queued behind the running group
    release.set()
    for t in threads:
        t.join(timeout=10)
    b.close()

    assert results == {f"a{i}": f"out-a{i}" for i in range(4)}
    assert groups[0] == ["a0"]
    # the queued followers coalesced into one group (order preserved)
    assert sorted(x for g in groups[1:] for x in g) == ["a1", "a2", "a3"]
    assert len(groups) == 2


def test_batcher_keeps_incompatible_keys_apart():
    groups = []
    release = threading.Event()

    def run_group(jobs, key):
        if not groups:
            release.wait(5)
        groups.append((key, [j.prompts[0] for j in jobs]))
        return ["ok"] * len(jobs)

    b = MicroBatcher(run_group, max_batch=4)
    threads = [
        threading.Thread(target=b.submit, args=(_job("hold"),)),
        threading.Thread(target=b.submit, args=(_job("same"),)),
        threading.Thread(target=b.submit, args=(_job("longer", f=8),)),
        threading.Thread(target=b.submit, args=(_job("same2"),)),
    ]
    threads[0].start()
    time.sleep(0.2)
    for t in threads[1:]:
        t.start()
        time.sleep(0.05)  # deterministic queue order
    release.set()
    for t in threads:
        t.join(timeout=10)
    b.close()

    batched = [names for _, names in groups]
    assert ["hold"] in batched
    assert ["same", "same2"] in batched  # coalesced around the f=8 job
    assert ["longer"] in batched


def test_batcher_propagates_group_error_to_every_member():
    def run_group(jobs, key):
        raise ValueError("chip on fire")

    b = MicroBatcher(run_group, max_batch=2)
    with pytest.raises(ValueError, match="chip on fire"):
        b.submit(_job("x"))
    # batcher must keep serving after a failed group
    with pytest.raises(ValueError, match="chip on fire"):
        b.submit(_job("y"))
    b.close()
    assert not b._thread.is_alive()
