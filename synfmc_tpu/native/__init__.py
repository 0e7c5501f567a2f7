"""First-party native (C++) runtime components.

fastimage: libpng decode + Pillow-bit-exact BILINEAR resize + threaded
batch clip decode for the data-loader hot path (SURVEY.md §2.7 — the
PIL/imageio row, upgraded from "keep third-party" to first-party).
"""

from synfmc_tpu.native import fastimage  # noqa: F401
