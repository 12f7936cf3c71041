"""Token assembly: splice compressed visual tokens into the text embedding
sequence at the <image> position.

Replaces the reference's per-sample Python splice loop
(tdc/cambrian_arch.py:1457-1734 + pad/stack :1747-1819) with a single scatter
into a fixed-size buffer: static shapes, one compile.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..constants import IGNORE_INDEX


def splice_visual(
    text_embeds: jnp.ndarray,  # [L, H] embeddings of input_ids (image token slot included)
    image_pos: int,  # static index of the <image> token in input_ids
    visual: jnp.ndarray,  # [V_max, H]
    n_visual: jnp.ndarray,  # scalar int32: valid visual tokens
    max_len: int,
    labels: Optional[jnp.ndarray] = None,  # [L] int32
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Returns (embeds [max_len, H], attn_mask [max_len] bool,
    labels [max_len] or None, seq_len scalar).

    Final layout: text[:image_pos] | visual[:n_visual] | text[image_pos+1:],
    right-padded to max_len.  Visual positions get IGNORE_INDEX labels
    (reference :1719-1726).
    """
    L, H = text_embeds.shape
    V = visual.shape[0]
    pre = text_embeds[:image_pos]
    post = text_embeds[image_pos + 1 :]
    n_post = L - image_pos - 1

    out = jnp.zeros((max_len + 1, H), text_embeds.dtype)
    out = out.at[:image_pos].set(pre)

    vis_slot = image_pos + jnp.arange(V)
    vis_keep = jnp.arange(V) < n_visual
    vis_slot = jnp.where(vis_keep & (vis_slot < max_len), vis_slot, max_len)
    out = out.at[vis_slot].set(visual)

    post_slot = image_pos + n_visual + jnp.arange(n_post)
    post_slot = jnp.where(post_slot < max_len, post_slot, max_len)
    out = out.at[post_slot].set(post)

    seq_len = jnp.minimum(L - 1 + n_visual, max_len)
    attn_mask = jnp.arange(max_len) < seq_len

    out_labels = None
    if labels is not None:
        lab = jnp.full((max_len + 1,), IGNORE_INDEX, jnp.int32)
        lab = lab.at[:image_pos].set(labels[:image_pos])
        lab = lab.at[post_slot].set(labels[image_pos + 1 :])
        out_labels = lab[:max_len]

    return out[:max_len], attn_mask, out_labels, seq_len
