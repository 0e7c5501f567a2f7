"""SynFMC-TPU: a TPU-native JAX rebuild of FMC (Free-Form Motion Control).

A three-stage, pose-controlled text-to-video generation framework
(SD1.5 + AnimateDiff topology) re-designed TPU-first:

- functional flax.linen modules with explicit parameter pytrees,
- NHWC layouts with the frame axis folded into batch for spatial ops and
  into (b*h*w, f) token groups for temporal attention,
- jit-compiled train steps sharded over a ``jax.sharding.Mesh``,
- Pallas flash-attention / fused GroupNorm kernels on the hot paths,
- Orbax checkpointing with torch-checkpoint interop.

Reference behavior: FudanCVL/SynFMC (see SURVEY.md). This package is a
from-scratch implementation; reference files are cited as ``file:line`` in
docstrings for behavioral parity only.
"""

__version__ = "0.4.0"
