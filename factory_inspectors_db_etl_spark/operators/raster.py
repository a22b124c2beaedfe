"""Shared raster-resample arithmetic for the four real image codecs.

One definition of the aspect-preserving nearest-neighbor target (the
``i*src//dst`` mapping — integer-exact, deterministic across platforms,
idempotent at a fixed max_side) so PPM/PNG/GIF/JPEG resizers cannot
drift apart (round-8 review finding: the mapping was copy-pasted four
times)."""

from __future__ import annotations

import numpy as np


def nn_target(
    w: int, h: int, max_side: int
) -> tuple[int, int, np.ndarray, np.ndarray]:
    """(new_w, new_h, row_index_map, col_index_map) for an
    aspect-preserving NN downsample where the longer side becomes
    ``max_side``.  Source pixel for target index i is ``i * src // dst``
    — the standard NN mapping; the shorter side floors to >= 1.
    Callers are expected to have already returned payloads that are
    within bounds (max(w, h) <= max_side) unchanged."""
    if w >= h:
        nw, nh = max_side, max(h * max_side // w, 1)
    else:
        nh, nw = max_side, max(w * max_side // h, 1)
    ys = (np.arange(nh) * h) // nh
    xs = (np.arange(nw) * w) // nw
    return nw, nh, ys, xs
