"""Pallas flash-attention kernel (TPU).

Filled in by the perf phase; until then flash_supported gates everything to
the XLA path.
"""

from __future__ import annotations

import jax


def flash_supported(q, k, v) -> bool:
    return False


def flash_attention(q, k, v, scale: float):
    raise NotImplementedError
