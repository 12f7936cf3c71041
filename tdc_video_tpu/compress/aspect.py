"""Aspect-ratio token layout: static-shape equivalent of unpad_image.

The reference crops each frame's feature grid back to the original aspect
before emission (unpad_image, tdc/cambrian_arch.py:512-545 applied at
:1200-1293): a 16:9 video keeps ~7 of 12 rows, so a static frame emits
cur_h*(cur_w+1) tokens (newline per kept row), and the Q-Former's avg-pooled
query pools over exactly those tokens.

TPU redesign: shapes stay fixed at P = side*(side+1); the aspect is carried by
(a) a [P] token-validity mask and (b) a [K, P] masked pooling matrix whose
bins follow the *compacted* valid sequence — both computed host-side per
video (the aspect is data, not shape).  Compression then masks/compacts, so
the emitted token sequence is the reference's, in the reference's order.

Divergence note (SURVEY.md section 7 "reference quirks"): reference training
passes PIL (width, height) sizes while its eval passes numpy (height, width),
so reference eval crops the wrong axis for non-square videos.  We implement
the training-consistent semantics (crop the padded axis) everywhere.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from ..config import TDCConfig


@functools.lru_cache(maxsize=256)
def _layout(side: int, newline: bool, orig_h: int, orig_w: int, K: int):
    """Returns (token_valid [P] bool, query_pool [K, P] f32)."""
    cols = side + (1 if newline else 0)
    P = side * cols

    # unpad_image row/col crop (reference :526-545), centered like expand2square
    if orig_w > orig_h:  # landscape: rows were padded
        new_h = int(orig_h * side / orig_w) if orig_h != orig_w else side
        pad = (side - new_h) // 2
        r0, r1 = pad, side - pad
        c0, c1 = 0, side
    elif orig_h > orig_w:  # portrait: cols were padded
        new_w = int(orig_w * side / orig_h)
        pad = (side - new_w) // 2
        r0, r1 = 0, side
        c0, c1 = pad, side - pad
    else:
        r0, r1, c0, c1 = 0, side, 0, side

    valid = np.zeros((side, cols), bool)
    valid[r0:r1, c0:c1] = True
    if newline:
        valid[r0:r1, side] = True  # one newline token per kept row
    flat_valid = valid.reshape(P)

    # pooling matrix: adaptive_avg_pool over the compacted valid sequence
    # (reference pools the unpadded key frame, cambrian_arch.py:1633-1638)
    idx = np.nonzero(flat_valid)[0]
    n = len(idx)
    pool = np.zeros((K, P), np.float32)
    for i in range(K):
        a = (i * n) // K
        b = -(-((i + 1) * n) // K)
        pool[i, idx[a:b]] = 1.0 / (b - a)
    return flat_valid, pool


def frame_token_layout(
    cfg: TDCConfig, orig_h: int, orig_w: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side per-video layout: (token_valid [P], query_pool [K, P])."""
    return _layout(
        cfg.sva.final_side_len,
        cfg.compression.is_image_newline,
        int(orig_h),
        int(orig_w),
        cfg.compression.context_token_num,
    )


def square_layout(cfg: TDCConfig) -> Tuple[np.ndarray, np.ndarray]:
    return frame_token_layout(cfg, 1, 1)
