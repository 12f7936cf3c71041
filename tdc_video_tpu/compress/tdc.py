"""Temporal Dynamic Context compression — the framework's novel core.

Static-shape, fully batched redesign of the reference compression loop
(tdc/cambrian_arch.py:1520-1709).  The reference iterates segments and 8-frame
chunks in Python, calling the Q-Former once per chunk; here:

1.  chunk assignment (segment boundaries -> per-frame chunk id / position) is
    computed with cumulative ops over a [T] frame axis;
2.  frames are scattered into a [MAX_CHUNKS, chunk_size, P+A, H] buffer;
3.  ONE batched Q-Former call compresses every (chunk, subsequent-frame) pair
    — [MAX_CHUNKS*(chunk_size-1)] batch of K-query cross-attentions, which is
    exactly the MXU-shaped workload the per-chunk Python loop denies XLA;
4.  emission ([static 144(+50 audio)+sep] + (n-1) x [K+sep] per chunk,
    reference :1668-1692), the global token-budget clamp (force_remove,
    :1694-1709) and final truncation are masked ops + one scatter compaction.

Everything compiles once per (T, P, A) bucket; no data-dependent Python.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TDCConfig
from ..models.layers import linear
from ..models.qformer import qformer_forward
from ..ops.pooling import adaptive_avg_pool_tokens

Params = Any


def init_compressor(key, cfg: TDCConfig, dtype=jnp.float32) -> Params:
    """Compressor params (reference initialize_compressor, cambrian_arch.py:469-486):
    Q-Former + query_proj (H->768) + vision_proj (768->H) + learned query tokens
    + frame separator embedding."""
    from ..models.layers import init_linear, normal_init
    from ..models.qformer import init_qformer

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    q = cfg.qformer
    H = cfg.lm.hidden_size
    return {
        "qformer": init_qformer(k1, q, dtype),
        "query_proj": init_linear(k2, H, q.hidden_size, dtype),
        "vision_proj": init_linear(k3, q.hidden_size, H, dtype),
        "query_tokens": normal_init(k4, (cfg.compression.context_token_num, q.hidden_size), dtype),
        "frame_seg": normal_init(k5, (H,), dtype, stddev=1.0),
    }


def max_chunks(cfg: TDCConfig, t_max: int) -> int:
    """Worst-case chunk count: sum over segments of ceil(n_s/chunk) is at most
    T/chunk + max_num_segments; short videos produce <= max_num_segments + 1
    one-frame chunks."""
    c = cfg.compression
    return math.ceil(t_max / c.chunk_size) + c.max_num_segments + 1


def assign_chunks(
    boundary: jnp.ndarray,  # [T] bool segment starts
    frame_mask: jnp.ndarray,  # [T] bool
    chunk_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (chunk_id [T], pos_in_chunk [T], num_chunks scalar).

    Chunks restart at every segment boundary and every `chunk_size` frames
    within a segment (reference :1603-1607).
    """
    T = boundary.shape[0]
    t = jnp.arange(T)
    b = (boundary & frame_mask).at[0].set(frame_mask[0])
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(b, t, -1))
    pos_in_seg = t - seg_start
    chunk_start = (b | (pos_in_seg % chunk_size == 0)) & frame_mask
    chunk_id = jnp.cumsum(chunk_start.astype(jnp.int32)) - 1
    chunk_anchor = jax.lax.associative_scan(jnp.maximum, jnp.where(chunk_start, t, -1))
    pos_in_chunk = t - chunk_anchor
    num_chunks = jnp.max(jnp.where(frame_mask, chunk_id, -1)) + 1
    return chunk_id, pos_in_chunk, num_chunks


def compress_video(
    cfg: TDCConfig,
    params: Params,  # {"qformer", "query_proj", "vision_proj", "query_tokens", "frame_seg"}
    frame_feats: jnp.ndarray,  # [T, P, H] per-frame LLM-space tokens
    frame_mask: jnp.ndarray,  # [T] bool
    boundary: jnp.ndarray,  # [T] bool segment starts
    text_ids: Optional[jnp.ndarray],  # [L] Q-Former prompt conditioning
    text_mask: Optional[jnp.ndarray],  # [L] bool
    audio_feats: Optional[jnp.ndarray] = None,  # [T, A, H] (already audio_proj'ed)
    max_visual_len: int = 4096,
    dtype=jnp.float32,
    token_valid: Optional[jnp.ndarray] = None,  # [P] bool aspect mask (compress/aspect.py)
    query_pool: Optional[jnp.ndarray] = None,  # [K, P] masked pooling matrix
    remat: bool = False,  # training: per-layer Q-Former checkpointing
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (visual [max_visual_len, H], n_visual scalar int32).

    token_valid / query_pool carry the unpad_image aspect crop (reference
    cambrian_arch.py:512-545 + :1200-1293): invalid (padding-region) tokens
    are excluded from the Q-Former encoder input, the pooled query, and the
    emitted sequence — with shapes unchanged."""
    c = cfg.compression
    T, P, H = frame_feats.shape
    n = c.chunk_size
    K = c.context_token_num
    A = 0 if audio_feats is None else audio_feats.shape[1]
    MC = max_chunks(cfg, T)
    if token_valid is None:
        token_valid = jnp.ones((P,), jnp.bool_)
    token_valid_pa = (
        jnp.concatenate([token_valid, jnp.ones((A,), jnp.bool_)]) if A else token_valid
    )

    tokens = frame_feats
    if audio_feats is not None:
        tokens = jnp.concatenate([frame_feats, audio_feats.astype(frame_feats.dtype)], axis=1)

    chunk_id, pos_in_chunk, num_chunks = assign_chunks(boundary, frame_mask, n)

    if c.add_static and T == 1:
        # Single image (1-frame "video"): the lone frame IS chunk 0's static
        # block; every (chunk, subsequent-frame) slot is invalid, so the
        # Q-Former output never reaches the emission.  Skip the chunk scatter
        # AND the Q-Former statically — this is the reference's image path,
        # which runs no compression at all (cambrian_arch.py:1195-1345) —
        # instead of scattering into a [MC+1, n, P+A, H] buffer (3.2 GB at
        # the stage-1 batch) and running (MC+1)*(n-1) rows of masked garbage
        # through 12 layers and their backward (~20 GB of saved internals,
        # PERF.md round 5).
        n_comp = n - 1
        key_block = jnp.zeros((MC + 1, P + A, H), tokens.dtype).at[0].set(tokens[0])
        chunk_valid = jnp.zeros((MC + 1,), jnp.bool_).at[0].set(frame_mask[0])
        others_valid = jnp.zeros((MC + 1, n_comp), jnp.bool_)
        comp = jnp.zeros((MC + 1, n_comp, K, H), tokens.dtype)
    else:
        # Scatter frames into chunk slots; invalid frames land in a trash row MC.
        row = jnp.where(frame_mask, chunk_id, MC)
        chunk_feats = jnp.zeros((MC + 1, n, P + A, H), tokens.dtype)
        chunk_feats = chunk_feats.at[row, pos_in_chunk].set(tokens)
        chunk_frame_valid = jnp.zeros((MC + 1, n), jnp.bool_)
        chunk_frame_valid = chunk_frame_valid.at[row, pos_in_chunk].set(frame_mask)
        chunk_valid = chunk_frame_valid[:, 0]  # a chunk exists iff slot 0 is filled

        key_block = chunk_feats[:, 0]  # [MC+1, P+A, H] static frame (incl. audio)
        key_visual = key_block[:, :P]  # visual-only for the pooled query (:1609 before :1614)

        if c.add_static:
            others = chunk_feats[:, 1:]  # [MC+1, n-1, P+A, H]
            others_valid = chunk_frame_valid[:, 1:]
            n_comp = n - 1
        else:
            others = chunk_feats
            others_valid = chunk_frame_valid
            n_comp = n

        # --- Query construction (reference :1633-1640) ---
        if c.query_type == "Avg_pool":
            if query_pool is None:
                pooled = adaptive_avg_pool_tokens(key_visual, K)  # [MC+1, K, H]
            else:
                pooled = jnp.einsum(
                    "kp,mpc->mkc", query_pool.astype(jnp.float32),
                    key_visual.astype(jnp.float32),
                ).astype(key_visual.dtype)
            query = linear(params["query_proj"], pooled)  # [MC+1, K, 768]
        else:
            query = jnp.broadcast_to(
                params["query_tokens"].astype(dtype)[None], (MC + 1, K, params["query_tokens"].shape[-1])
            )
        query = jnp.broadcast_to(query[:, None], (MC + 1, n_comp, K, query.shape[-1]))

        # --- One batched Q-Former pass over all (chunk, frame) pairs ---
        B = (MC + 1) * n_comp
        enc = others.reshape(B, P + A, H)
        enc_mask = others_valid[..., None] & token_valid_pa[None, None]
        enc_mask = jnp.broadcast_to(enc_mask, (MC + 1, n_comp, P + A)).reshape(B, P + A)
        q_flat = query.reshape(B, K, -1)
        if c.text_input and text_ids is not None:
            ids_b = jnp.broadcast_to(text_ids[None], (B, text_ids.shape[0]))
            tmask_b = jnp.broadcast_to(text_mask[None], (B, text_mask.shape[0]))
        else:
            ids_b = tmask_b = None
        out = qformer_forward(
            cfg.qformer, params["qformer"], q_flat, ids_b, tmask_b, enc, enc_mask,
            dtype=dtype, remat=remat,
        )  # [B, K, 768]
        comp = linear(params["vision_proj"], out)  # [B, K, H]
        comp = comp / jnp.sqrt(jnp.sum(comp.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-12).astype(comp.dtype)
        comp = comp.reshape(MC + 1, n_comp, K, H).astype(tokens.dtype)

    # --- Emission (reference :1617-1692) ---
    sep = params["frame_seg"].astype(tokens.dtype)
    pieces = []
    pieces_valid = []
    if c.add_static:
        kb = key_block
        kb_valid = chunk_valid[:, None] & token_valid_pa[None]
        if c.add_sep:
            kb = jnp.concatenate([kb, jnp.broadcast_to(sep[None, None], (MC + 1, 1, H))], axis=1)
            kb_valid = jnp.concatenate([kb_valid, chunk_valid[:, None]], axis=1)
        pieces.append(kb)
        pieces_valid.append(kb_valid)

    ob = comp  # [MC+1, n_comp, K, H]
    ob_valid = jnp.broadcast_to(others_valid[..., None], (MC + 1, n_comp, K))
    if c.add_sep:
        ob = jnp.concatenate(
            [ob, jnp.broadcast_to(sep[None, None, None], (MC + 1, n_comp, 1, H))], axis=2
        )
        ob_valid = jnp.concatenate([ob_valid, others_valid[..., None]], axis=2)
    pieces.append(ob.reshape(MC + 1, -1, H))
    pieces_valid.append(ob_valid.reshape(MC + 1, -1))

    chunk_out = jnp.concatenate(pieces, axis=1)  # [MC+1, E, H]
    chunk_out_valid = jnp.concatenate(pieces_valid, axis=1)  # [MC+1, E]
    chunk_out_valid = chunk_out_valid & (jnp.arange(MC + 1) <= MC - 1)[:, None]  # drop trash row
    E = chunk_out.shape[1]

    # --- Global budget clamp (reference :1694-1709) ---
    total = chunk_out_valid.sum()
    excess = jnp.maximum(total - max_visual_len, 0)
    force_remove = jnp.where(
        excess > 0, -(-excess // jnp.maximum(num_chunks, 1)), 0
    )  # ceil div
    # rank from the end among valid tokens within each chunk
    rev_rank = jnp.cumsum(chunk_out_valid[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1]
    keep = chunk_out_valid & (rev_rank > force_remove)

    # --- Compaction into the output buffer ---
    # Scattering full H-wide rows is slow on TPU; scatter int32 source
    # indices instead and GATHER the rows (slots beyond n_visual hold
    # arbitrary rows — every consumer masks by n_visual).
    flat = chunk_out.reshape(-1, H)
    flat_keep = keep.reshape(-1)
    target = jnp.cumsum(flat_keep.astype(jnp.int32)) - 1
    slot = jnp.where(flat_keep & (target < max_visual_len), target, max_visual_len)
    src = jnp.zeros((max_visual_len + 1,), jnp.int32).at[slot].set(
        jnp.arange(flat.shape[0], dtype=jnp.int32)
    )
    visual = flat[src[:max_visual_len]]
    n_visual = jnp.minimum(flat_keep.sum(), max_visual_len).astype(jnp.int32)
    return visual, n_visual
