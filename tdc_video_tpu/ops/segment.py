"""Scene segmentation: cosine similarity of adjacent DINO features + top-k
lowest-similarity boundaries.

Jittable, static-shape redesign of the reference `adapt_segment`
(tdc/cambrian_arch.py:783-861):

* short videos (<= max_num_segments + 1 valid frames) make every frame its own
  segment (reference :803-810 appends arange as boundary indices — i.e. no
  compression for short clips);
* otherwise the max_num_segments adjacent pairs with the lowest cosine
  similarity become segment cuts (reference :849 argsort[:k]).

The reference's windowed similarity loop (:837-842) is pure batching — one
fused einsum computes all T-1 similarities here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adjacent_cosine_similarity(feats: jnp.ndarray, frame_mask: jnp.ndarray) -> jnp.ndarray:
    """feats [T, ...] (flattened per frame), mask [T] -> sims [T-1] f32.
    Invalid pairs get +2.0 (never selected as cuts)."""
    T = feats.shape[0]
    flat = feats.reshape(T, -1).astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(flat * flat, axis=-1) + 1e-12)
    dots = jnp.sum(flat[:-1] * flat[1:], axis=-1)
    sims = dots / (norm[:-1] * norm[1:])
    valid_pair = frame_mask[:-1] & frame_mask[1:]
    return jnp.where(valid_pair, sims, 2.0)


def segment_boundaries(
    dino_feats: jnp.ndarray,  # [T, tokens, C] (or any [T, ...])
    frame_mask: jnp.ndarray,  # [T] bool
    max_num_segments: int,
) -> jnp.ndarray:
    """Returns boundary [T] bool: True where a new segment starts.  Frame 0 of
    the valid range always starts a segment."""
    T = dino_feats.shape[0]
    n_valid = frame_mask.sum()

    sims = adjacent_cosine_similarity(dino_feats, frame_mask)
    k = min(max_num_segments, T - 1) if T > 1 else 0
    if k > 0:
        _, cut_idx = jax.lax.top_k(-sims, k)  # k smallest similarities
        long_boundary = jnp.zeros((T,), jnp.bool_).at[cut_idx + 1].set(True)
    else:
        long_boundary = jnp.zeros((T,), jnp.bool_)
    long_boundary = long_boundary & frame_mask
    long_boundary = long_boundary.at[0].set(frame_mask[0])

    short = n_valid <= max_num_segments + 1
    return jnp.where(short, frame_mask, long_boundary)


def uniform_sample_indices(n_frames: int, max_frames: int):
    """Reference uniform resample (cambrian_arch.py:910-912): floor(interval*i).
    Host-side helper — returns a python list."""
    if n_frames <= max_frames:
        return list(range(n_frames))
    interval = n_frames / float(max_frames)
    return [int(interval * i) for i in range(max_frames)]
