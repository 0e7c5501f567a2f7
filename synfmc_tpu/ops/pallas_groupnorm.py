"""Fused GroupNorm(+activation) Pallas kernel (TPU).

Filled in by the perf phase; until then pallas_gn_supported gates everything
to the XLA path.
"""

from __future__ import annotations


def pallas_gn_supported(x, num_groups: int) -> bool:
    return False


def fused_group_norm(x, scale, bias, num_groups: int, eps: float, act):
    raise NotImplementedError
