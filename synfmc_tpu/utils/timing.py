"""Device timing utilities that are correct under the axon TPU tunnel.

The tunnel (a) caches identical (executable, args) executions and (b) returns
from block_until_ready before device completion.  Honest timing therefore
requires FRESH input values per run and a scalar host fetch to force
completion.  All perf numbers in this repo use these helpers.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def fetch(x) -> float:
    """Force execution to completion by fetching a scalar."""
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def device_time(fn: Callable, make_args: Callable[[int], tuple], n_runs: int = 3,
                warmup: bool = True) -> float:
    """Best-of-n wall seconds for fn(*make_args(i)) with fresh args per run."""
    if warmup:
        args = make_args(-1)
        fetch(fn(*args))
    times = []
    for i in range(n_runs):
        args = make_args(i)
        for a in jax.tree_util.tree_leaves(args):
            if hasattr(a, "block_until_ready"):
                fetch(a)
        t0 = time.time()
        out = fn(*args)
        fetch(out)
        times.append(time.time() - t0)
    return min(times)
