"""Dynamic micro-batching for the serving daemon.

The reference has no serving story at all (SURVEY.md §2.3 — its pipelines
run only inside training validation); scripts/serve.py adds one, and this
module adds throughput under concurrent load: requests that agree on the
compiled-shape-relevant parameters (video_length, steps, guidance) are
coalesced into ONE batched pipeline call instead of queueing serially on
the chip.

Design constraints honored:

- **Bounded compile count.** Batched shapes are bucketed to powers of two
  up to ``max_batch`` (1, 2, 4, …); a group of 3 samples pads to 4 by
  repeating the last sample and the padded outputs are dropped.  XLA
  compiles one executable per bucket, not per group size.
- **Per-request seeds stay exact.** Each request's initial latents are
  drawn from its OWN ``PRNGKey(seed)`` at its own shape and concatenated,
  so a batched sample gets the identical starting noise its solo run would
  (batch invariance of the UNet does the rest — pinned by
  tests/test_pipeline.py::test_pipeline_batch_invariance).
- **Errors are per-group, surfaced per-request.** A failing group marks
  every member with the exception; the dispatch thread keeps serving.

The batcher is transport-agnostic: ``run_group(jobs, key) -> list[result]``
is supplied by the caller (serve.py builds the padded pipeline call there).
"""

from __future__ import annotations

import threading
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable, Optional


@dataclass
class Job:
    """One /generate request: ``prompts`` contributes len(prompts) samples."""

    prompts: list
    seed: int
    camera_txt: Optional[str]
    video_length: int
    steps: int
    guidance: float
    event: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Optional[BaseException] = None

    @property
    def key(self) -> tuple:
        return (self.video_length, self.steps, self.guidance)

    @property
    def n(self) -> int:
        return len(self.prompts)


def bucket_size(n: int, max_batch: int) -> int:
    """Next power of two >= n, capped at max_batch (compile-count bound)."""
    b = 1
    while b < n:
        b *= 2
    return min(b, max(max_batch, n))


class MicroBatcher:
    """Single dispatch thread owning the device; callers block in submit().

    ``batch_window``: after picking up a head request, wait up to this many
    seconds for same-key followers before dispatching (0 = never wait —
    coalescing then only happens when requests are already queued behind a
    running group, which is exactly the overloaded case batching exists for).
    """

    def __init__(self, run_group: Callable, max_batch: int = 1,
                 batch_window: float = 0.0):
        self.run_group = run_group
        self.max_batch = max(1, int(max_batch))
        self.batch_window = float(batch_window)
        self._buf: deque[Job] = deque()
        self._cv = threading.Condition()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="serve-batcher")
        self._thread.start()

    def submit(self, job: Job):
        with self._cv:
            self._buf.append(job)
            self._cv.notify()
        job.event.wait()
        if job.error is not None:
            raise job.error
        return job.result

    def close(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------

    def _take_group(self) -> Optional[list[Job]]:
        with self._cv:
            while not self._buf and not self._stop:
                self._cv.wait()
            if self._stop and not self._buf:
                return None
            group = [self._buf.popleft()]
        if self.batch_window > 0 and group[0].n < self.max_batch:
            # optional accumulation pause for bursty-but-not-yet-queued load
            threading.Event().wait(self.batch_window)
        with self._cv:
            budget = self.max_batch - group[0].n
            i = 0
            while i < len(self._buf) and budget > 0:
                j = self._buf[i]
                if j.key == group[0].key and j.n <= budget:
                    del self._buf[i]
                    group.append(j)
                    budget -= j.n
                else:
                    i += 1
        return group

    def _loop(self) -> None:
        while True:
            group = self._take_group()
            if group is None:
                return
            try:
                results = self.run_group(group, group[0].key)
                assert len(results) == len(group)
                for j, r in zip(group, results):
                    j.result = r
            except BaseException as e:
                for j in group:
                    j.error = e
            finally:
                for j in group:
                    j.event.set()
