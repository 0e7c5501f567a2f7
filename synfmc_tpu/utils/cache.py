"""Persistent XLA compile cache shared by every entry point.

Full-model compiles are minutes cold on TPU (~100 s for the flagship
pipeline, PERF.md) and fractions of a second warm; the reference pays the
equivalent torch/cuda warmup on every process start.  Every CLI
(train/bench/generate/serve) and the test suite point at the same on-disk
cache so a daemon restart or a re-launched job skips straight to execution.
"""

from __future__ import annotations

import os


def enable_compile_cache(repo_root: str | None = None) -> str:
    """Align the JAX runtime with the declared platform + point the
    persistent compilation cache at the repo-local dir.

    Must run before the first jit compilation.  CPU runs (tests, --cpu
    modes) use a separate directory: compiled artifacts are keyed by
    backend, and keeping them apart avoids churning one cache from two
    device types.  ``JAX_COMPILATION_CACHE_DIR`` overrides for shared /
    multi-host deployments.  Returns the directory used.

    The platform re-assert below is load-bearing: under the remote-TPU
    plugin the ``JAX_PLATFORMS`` env var alone is silently IGNORED
    (tests/conftest.py and __graft_entry__.py carry the same workaround), so
    a subprocess launched with ``JAX_PLATFORMS=cpu`` — every trainer/server
    subprocess the e2e tests spawn — would otherwise run on the real chip
    and pay tunnel compiles while choosing the CPU cache dir from the env
    string (measured: the preemption e2e test's tiny-model compile went
    ~10 min through the tunnel and timed the test out).
    """
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cache = ".jax_cache_cpu" if os.environ.get("JAX_PLATFORMS") == "cpu" else ".jax_cache"
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.join(repo_root, cache))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
