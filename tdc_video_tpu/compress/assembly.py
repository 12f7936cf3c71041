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


def splice_visual_dynamic(
    text_embeds: jnp.ndarray,  # [L, H] embeddings of input_ids (incl. <image> slot)
    image_pos: jnp.ndarray,  # scalar int32: position of the <image> token
    visual: jnp.ndarray,  # [V_max, H]
    n_visual: jnp.ndarray,  # scalar int32
    max_len: int,
    labels: Optional[jnp.ndarray] = None,  # [L] int32
    text_len: Optional[jnp.ndarray] = None,  # scalar int32 valid text length
    has_image: Optional[jnp.ndarray] = None,  # scalar bool; False = text-only row
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Traced-position variant of splice_visual (vmap-able over a batch with
    per-sample <image> positions, as produced by the collator — reference
    inserts the image token at data-dependent offsets, tdc/train.py:794-814).

    Layout: text[:image_pos] | visual[:n_visual] | text[image_pos+1:text_len],
    right-padded to max_len.  For text-only rows (has_image=False) no text slot
    is consumed and n_visual is forced to 0.  Pure gathers — no dynamic slices,
    one compile.
    """
    L, H = text_embeds.shape
    V = visual.shape[0]
    tl = jnp.asarray(L, jnp.int32) if text_len is None else text_len.astype(jnp.int32)
    hi = jnp.asarray(True) if has_image is None else has_image
    skip = jnp.where(hi, 1, 0).astype(jnp.int32)  # the <image> slot itself
    nv = jnp.where(hi, n_visual.astype(jnp.int32), 0)
    nv = jnp.minimum(nv, max_len - (tl - skip))

    j = jnp.arange(max_len, dtype=jnp.int32)
    in_pre = j < image_pos
    in_vis = (j >= image_pos) & (j < image_pos + nv)
    t_idx = jnp.where(in_pre, j, j - nv + skip)  # post region skips the <image> slot
    t_idx_c = jnp.clip(t_idx, 0, L - 1)
    v_idx = jnp.clip(j - image_pos, 0, V - 1)

    out = jnp.where(in_vis[:, None], visual[v_idx], text_embeds[t_idx_c])
    seq_len = jnp.minimum(tl - skip + nv, max_len)
    attn_mask = j < seq_len
    out = jnp.where(attn_mask[:, None], out, 0)

    out_labels = None
    if labels is not None:
        lab = jnp.where(in_vis, IGNORE_INDEX, labels[t_idx_c])
        out_labels = jnp.where(attn_mask, lab, IGNORE_INDEX).astype(jnp.int32)
    return out, attn_mask, out_labels, seq_len


def splice_visual_multi(
    text_embeds: jnp.ndarray,  # [L, H]
    image_pos: jnp.ndarray,  # [M] int32 positions of <image> slots, ascending; -1 = unused
    visual: jnp.ndarray,  # [M, V_max, H] per-image visual tokens
    n_visual: jnp.ndarray,  # [M] int32 valid tokens per image
    max_len: int,
    labels: Optional[jnp.ndarray] = None,  # [L] int32
    text_len: Optional[jnp.ndarray] = None,  # scalar int32
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Multiple <image> slots per sample (the reference's splice loop handles
    any number, tdc/cambrian_arch.py:1457-1734; mm_datautils.py:579 splits on
    every <image>).  Layout:

        text[:p0] | vis0 | text[p0+1:p1] | vis1 | text[p1+1:...] ...

    right-padded to max_len.  Pure gathers over a static M — one compile,
    vmap-able.  Unused slots are image_pos=-1 with n_visual forced to 0.
    """
    L, H = text_embeds.shape
    M, V, _ = visual.shape
    tl = jnp.asarray(L, jnp.int32) if text_len is None else text_len.astype(jnp.int32)
    valid = image_pos >= 0  # [M]
    pos = jnp.where(valid, image_pos, L).astype(jnp.int32)
    nv = jnp.where(valid, n_visual.astype(jnp.int32), 0)
    # delta_m = tokens inserted minus the <image> slot consumed
    delta = nv - valid.astype(jnp.int32)  # [M]
    cum_before = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(delta)[:-1]])
    vis_start = pos + cum_before  # [M] output offset of each visual block

    j = jnp.arange(max_len, dtype=jnp.int32)  # [max_len]
    in_vis_m = (j[:, None] >= vis_start[None]) & (
        j[:, None] < (vis_start + nv)[None]
    )  # [max_len, M]
    in_vis = in_vis_m.any(-1)
    which = jnp.argmax(in_vis_m, axis=-1)  # [max_len]
    v_idx = jnp.clip(j - vis_start[which], 0, V - 1)
    vis_src = visual[which, v_idx]  # [max_len, H]

    # text index: undo insertions of every block that ends at or before j
    passed = (j[:, None] >= (vis_start + nv)[None]).astype(jnp.int32)  # [max_len, M]
    shift = (passed * delta[None]).sum(-1)
    t_idx = jnp.clip(j - shift, 0, L - 1)
    out = jnp.where(in_vis[:, None], vis_src, text_embeds[t_idx])

    seq_len = jnp.minimum(tl + delta.sum(), max_len)
    attn_mask = j < seq_len
    out = jnp.where(attn_mask[:, None], out, 0)

    out_labels = None
    if labels is not None:
        lab = jnp.where(in_vis, IGNORE_INDEX, labels[t_idx])
        out_labels = jnp.where(attn_mask, lab, IGNORE_INDEX).astype(jnp.int32)
    return out, attn_mask, out_labels, seq_len


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
