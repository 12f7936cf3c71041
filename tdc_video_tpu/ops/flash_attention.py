"""Pallas flash-attention kernel (TPU).

TPU-native replacement for the reference's external flash-attn-2 CUDA
dependency (tdc/builder.py:71-72).  Online-softmax tiling over the KV axis so
long video prefill (thousands of tokens) never materializes the [T, S] score
matrix in HBM.

Design:
* grid = (batch, kv_head, q_head_group, q_block): GQA shares one VMEM-resident
  K/V block across all query heads of the group — no jnp.repeat blow-up, and
  the pipelined K/V fetch is reused across the two inner grid dims;
* the KV axis streams through the MXU in `block_k` tiles with online softmax
  (m/l running max/sum) carried in registers;
* causal blocks above the diagonal are skipped entirely (fori_loop bound);
* right-padded batches need no explicit key mask: with causal masking and
  padding at the end, valid rows only ever see valid columns.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30

# Set True in tests to run the kernel through the Pallas interpreter on CPU.
INTERPRET = False


def _flash_kernel(
    q_ref,  # [BLOCK_Q, D]
    k_ref,  # [S_pad, D]
    v_ref,  # [S_pad, D]
    o_ref,  # [BLOCK_Q, D]
    lse_ref,  # [BLOCK_Q, 1] f32 — logsumexp of scaled scores (backward residual)
    *,
    scale: float,
    causal: bool,
    block_k: int,
    kv_len: int,
):
    block_q, d = q_ref.shape
    s_pad = k_ref.shape[0]
    # Dots take INPUT-dtype operands (bf16 on the serving path) with f32
    # accumulation: an f32 x f32 MXU matmul decomposes into multiple bf16
    # passes (~1/3 throughput — measured as ~38% attention MFU before this).
    # The scalar scale applies to the f32 score AFTER the dot, exactly like
    # the XLA sdpa path (layers.sdpa), so f32-input parity stays bitwise.
    q = q_ref[:]
    qi = pl.program_id(3) * block_q  # absolute start row of this Q block

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    num_kb = s_pad // block_k

    def body(kb, carry):
        m, l, acc = carry
        ks = kb * block_k
        k_blk = k_ref[pl.ds(ks, block_k), :]
        v_blk = v_ref[pl.ds(ks, block_k), :]
        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BLOCK_Q, BLOCK_K]

        col = ks + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col < kv_len
        if causal:
            row = qi + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    if causal:
        # Skip KV blocks strictly above the diagonal of this Q block.
        last_row = qi + block_q - 1
        bound = jnp.minimum(num_kb, (last_row // block_k) + 1)
    else:
        bound = num_kb
    m, l, acc = jax.lax.fori_loop(0, bound, body, (m, l, acc))

    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[:] = m + jnp.log(jnp.maximum(l, 1e-30))


def _full_attention_kernel(
    q_ref,  # [NB, S_pad, D]
    k_ref,  # [NB, S_pad, D]
    v_ref,  # [NB, S_pad, D]
    o_ref,  # [NB, S_pad, D]
    lse_ref,  # [NB, S_pad, 1]
    *,
    scale: float,
    kv_len: int,
):
    """Non-causal full attention for short sequences (ViT towers: 729/730
    tokens): the whole [S, S] score fits VMEM, and NB frames run per grid
    step as one batched dot — the blocked online-softmax kernel here is
    latency-bound (measured ~35% MFU: 64-wide contractions over thousands of
    tiny grid steps), while the batched form amortizes the grid and DMA
    overhead across frames."""
    nb, s_pad, d = q_ref.shape
    # input-dtype dot operands, f32 accumulation, post-dot scale (see
    # _flash_kernel note: f32 x f32 MXU dots run at ~1/3 bf16 throughput)
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    # Padded v rows may hold arbitrary bits (implicit edge padding on the
    # inference path); zero them so 0-weight x NaN cannot poison the PV dot.
    vrow = jax.lax.broadcasted_iota(jnp.int32, (nb, s_pad, 1), 1)
    v = jnp.where(vrow < kv_len, v, 0.0)
    s = scale * jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [NB, S, S]
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, s_pad, s_pad), 2)
    s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[:] = m + jnp.log(jnp.maximum(l, 1e-30))


def _flash_full(q, k, v, scale, groups, pad_inputs=True):
    """Dispatch wrapper for the batched full-attention kernel.

    pad_inputs=False (inference) relies on Mosaic's implicit edge padding of
    the partial tail block instead of explicit HBM pad ops (the kernel masks
    padded k columns and zeroes padded v rows).  The training path keeps
    explicit zero pads: the backward kernels require padded do rows to be
    exactly zero."""
    B, Hq, T, D = q.shape
    S = k.shape[2]
    s_pad = pl.cdiv(S, 128) * 128
    if s_pad != S and pad_inputs:
        pad = ((0, 0), (0, 0), (0, s_pad - S), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    # frames per grid step, bounded by the [NB, S, S] f32 score VMEM footprint
    nb = 1
    for cand in (4, 2):
        if B % cand == 0 and cand * s_pad * s_pad * 4 <= 8 * 1024 * 1024:
            nb = cand
            break
    grid = (B // nb, Hq)
    out, lse = pl.pallas_call(
        functools.partial(_full_attention_kernel, scale=scale, kv_len=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, None, s_pad, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((nb, None, s_pad, D), lambda b, h, g=groups: (b, h // g, 0, 0)),
            pl.BlockSpec((nb, None, s_pad, D), lambda b, h, g=groups: (b, h // g, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((nb, None, s_pad, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((nb, None, s_pad, 1), lambda b, h: (b, h, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, s_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, s_pad, 1), jnp.float32),
        ),
        interpret=INTERPRET,
    )(q, k, v)
    return out[:, :, :T], lse


def _nhd_head_block(head_dim: int) -> int:
    """Heads per lane-block: smallest hb with hb*D lane-legal (128k)."""
    hb = 1
    while (hb * head_dim) % 128 != 0:
        hb *= 2
    return hb


def _full_attention_nhd_kernel(
    q_ref,  # [NB, S_pad, HB*D] (lane-sliced from the packed [B, N, H*D])
    k_ref,
    v_ref,
    o_ref,  # [NB, S_pad, HB*D]
    *,
    scale: float,
    kv_len: int,
    head_dim: int,
):
    """Layout-native variant of _full_attention_kernel: consumes q/k/v in
    the NATURAL packed [B, N, H*D] projection layout (lane-dim head blocks),
    so XLA emits no [B,N,H,D]->[B,H,N,D] transposes and no pad-to-128 ops
    around the attention (profiled at ~2.5x the kernel's own cost in the
    int8 towers).  The kernel loops the block's heads statically, one [S,S]
    f32 score at a time in VMEM.  The tail partial token block (N=729/730 vs
    768) uses Mosaic's implicit edge padding; padded k columns are masked in
    the score and padded v rows are zeroed (their pad bits may be NaN)."""
    nb, s_pad, hd_tot = q_ref.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, s_pad, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, s_pad, s_pad), 2)
    for j in range(hd_tot // head_dim):
        sl = pl.ds(j * head_dim, head_dim)
        # input-dtype dot operands, f32 accumulation, post-dot scale (see
        # _flash_kernel note) — this took the NHD attention calls from ~38%
        # to bf16-native MFU
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        v = jnp.where(row < kv_len, v, 0.0)
        s = scale * jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [NB, S, S]
        s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _full_attention_nhd_seqq_kernel(
    q_ref,  # [BQ, H*D] (one q-token block, all heads packed)
    k_ref,  # [S_pad, H*D]
    v_ref,
    o_ref,  # [BQ, H*D]
    *,
    scale: float,
    kv_len: int,
    head_dim: int,
):
    """Whole-lane-dim variant for head dims whose minimal lane block is too
    fat for VMEM (SigLIP D=72 -> hb=16 -> 1152 lanes): q is blocked over
    TOKENS instead, k/v ride whole; the head loop slices lanes per head."""
    bq, hd_tot = q_ref.shape
    s_pad = k_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, s_pad), 1)
    for j in range(hd_tot // head_dim):
        sl = pl.ds(j * head_dim, head_dim)
        # input-dtype dot operands, f32 accumulation, post-dot scale
        q = q_ref[:, sl]
        k = k_ref[:, sl]
        v = v_ref[:, sl]
        v = jnp.where(row < kv_len, v, 0.0)
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, S_pad]
        s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, sl] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_full_nhd_fwd(q, k, v, scale, groups):
    B, S, Hq, D = q.shape
    hb = _nhd_head_block(D)
    s_pad = pl.cdiv(S, 128) * 128
    qp = q.reshape(B, S, Hq * D)
    kp = k.reshape(B, S, Hq * D)
    vp = v.reshape(B, S, Hq * D)
    if hb * D <= 256:
        nb = 1
        if B % 2 == 0 and 2 * s_pad * s_pad * 4 <= 8 * 1024 * 1024:
            nb = 2
        grid = (B // nb, Hq // hb)
        out = pl.pallas_call(
            functools.partial(
                _full_attention_nhd_kernel, scale=scale, kv_len=S, head_dim=D
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((nb, s_pad, hb * D), lambda b, h: (b, 0, h)),
                pl.BlockSpec((nb, s_pad, hb * D), lambda b, h: (b, 0, h)),
                pl.BlockSpec((nb, s_pad, hb * D), lambda b, h: (b, 0, h)),
            ],
            out_specs=pl.BlockSpec((nb, s_pad, hb * D), lambda b, h: (b, 0, h)),
            out_shape=jax.ShapeDtypeStruct((B, S, Hq * D), q.dtype),
            interpret=INTERPRET,
        )(qp, kp, vp)
    else:
        # fat lane dim (hb*D == Hq*D): block q over tokens, k/v whole
        bq = 256
        grid = (B, pl.cdiv(s_pad, bq))
        out = pl.pallas_call(
            functools.partial(
                _full_attention_nhd_seqq_kernel, scale=scale, kv_len=S, head_dim=D
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, bq, Hq * D), lambda b, i: (b, i, 0)),
                pl.BlockSpec((None, s_pad, Hq * D), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((None, s_pad, Hq * D), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((None, bq, Hq * D), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, S, Hq * D), q.dtype),
            interpret=INTERPRET,
        )(qp, kp, vp)
    return out.reshape(B, S, Hq, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_full_nhd(q, k, v, scale, groups):
    """Non-causal full attention in [B, N, H, D] layout (ViT towers)."""
    return _flash_full_nhd_fwd(q, k, v, scale, groups)


def _flash_full_nhd_vjp_fwd(q, k, v, scale, groups):
    return _flash_full_nhd_fwd(q, k, v, scale, groups), (q, k, v)


def _flash_full_nhd_vjp_bwd(scale, groups, res, do):
    # Training path: route through the BHTD kernels (transposes acceptable
    # off the serving hot path); flash bwd is recompute-based anyway.
    q, k, v = res
    S = q.shape[1]
    block = max(128, pl.cdiv(S, 128) * 128)

    def f(q_, k_, v_):
        out = _flash_core(
            q_.transpose(0, 2, 1, 3),
            k_.transpose(0, 2, 1, 3),
            v_.transpose(0, 2, 1, 3),
            False,
            scale,
            block,
            block,
            groups,
        )
        return out.transpose(0, 2, 1, 3)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(do)


_flash_full_nhd.defvjp(_flash_full_nhd_vjp_fwd, _flash_full_nhd_vjp_bwd)


def _flash_gqa(
    q: jnp.ndarray,  # [B, Hq, T, D]
    k: jnp.ndarray,  # [B, Hkv, S, D]
    v: jnp.ndarray,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    groups: int,
    pad_inputs: bool = True,
) -> jnp.ndarray:
    B, Hq, T, D = q.shape
    S = k.shape[2]
    if not causal and T == S and S <= 1024:
        return _flash_full(q, k, v, scale, groups, pad_inputs=pad_inputs)
    t_pad = pl.cdiv(T, block_q) * block_q
    s_pad = pl.cdiv(S, block_k) * block_k
    if t_pad != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    if s_pad != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))

    Hkv = Hq // groups
    grid = (B, Hkv, groups, t_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            scale=scale,
            causal=causal,
            block_k=block_k,
            kv_len=S,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (None, None, block_q, D), lambda b, h, g, i: (b, h * groups + g, i, 0)
            ),
            pl.BlockSpec((None, None, s_pad, D), lambda b, h, g, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, s_pad, D), lambda b, h, g, i: (b, h, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec(
                (None, None, block_q, D), lambda b, h, g, i: (b, h * groups + g, i, 0)
            ),
            pl.BlockSpec(
                (None, None, block_q, 1), lambda b, h, g, i: (b, h * groups + g, i, 0)
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, t_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, t_pad, 1), jnp.float32),
        ),
        interpret=INTERPRET,
    )(q, k, v)
    return out[:, :, :T], lse


# ---------------------------------------------------------------------------
# Backward kernels (recompute-based: residuals are q, k, v, o, lse)
#
#   S = scale * Q K^T;  P = exp(S - lse);  O = P V
#   delta_i = sum_d dO_id O_id
#   dV = P^T dO
#   dS = P * (dO V^T - delta)
#   dQ = scale * dS K;   dK = scale * dS^T Q
# ---------------------------------------------------------------------------


def _flash_dq_kernel(
    q_ref,  # [BLOCK_Q, D]
    k_ref,  # [S_pad, D]
    v_ref,  # [S_pad, D]
    do_ref,  # [BLOCK_Q, D]
    lse_ref,  # [BLOCK_Q, 1]
    delta_ref,  # [BLOCK_Q, 1]
    dq_ref,  # [BLOCK_Q, D] out
    *,
    scale: float,
    causal: bool,
    block_k: int,
    kv_len: int,
):
    block_q, d = q_ref.shape
    s_pad = k_ref.shape[0]
    # input-dtype dot operands with f32 accumulation (see _flash_kernel note)
    q = q_ref[:]
    do = do_ref[:]
    lse = lse_ref[:]
    delta = delta_ref[:]
    qi = pl.program_id(3) * block_q

    num_kb = s_pad // block_k

    def body(kb, acc):
        ks = kb * block_k
        k_blk = k_ref[pl.ds(ks, block_k), :]
        v_blk = v_ref[pl.ds(ks, block_k), :]
        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = ks + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col < kv_len
        if causal:
            row = qi + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        last_row = qi + block_q - 1
        bound = jnp.minimum(num_kb, (last_row // block_k) + 1)
    else:
        bound = num_kb
    acc = jax.lax.fori_loop(0, bound, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[:] = (scale * acc).astype(dq_ref.dtype)


def _flash_dkv_kernel(
    q_ref,  # [BLOCK_Q, D]
    k_ref,  # [BLOCK_K, D]
    v_ref,  # [BLOCK_K, D]
    do_ref,  # [BLOCK_Q, D]
    lse_ref,  # [BLOCK_Q, 1]
    delta_ref,  # [BLOCK_Q, 1]
    dk_ref,  # [BLOCK_K, D] out (per-q-head partial; summed over GQA group outside)
    dv_ref,  # [BLOCK_K, D] out
    *,
    scale: float,
    causal: bool,
    block_q: int,
    kv_len: int,
):
    """Grid = (B, Hq, kv_block, q_block) with q innermost: the dk/dv output
    block is revisited across the q iterations and accumulated in VMEM —
    no full-T q/do residency (which OOMs VMEM at 8k context)."""
    block_k, d = k_ref.shape
    ks = pl.program_id(2) * block_k
    qb = pl.program_id(3)
    qs = qb * block_q

    @pl.when(qb == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    def _accum():
        # input-dtype dot operands with f32 accumulation (see _flash_kernel)
        k = k_ref[:]
        v = v_ref[:]
        q_blk = q_ref[:]
        do_blk = do_ref[:]
        lse = lse_ref[:]
        delta = delta_ref[:]
        s = scale * jax.lax.dot_general(
            q_blk, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BLOCK_Q, BLOCK_K]
        col = ks + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col < kv_len
        if causal:
            row = qs + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv_ref[:] += jax.lax.dot_general(
            p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_ref[:] += scale * jax.lax.dot_general(
            ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        # Q blocks entirely above this KV block's diagonal contribute nothing.
        pl.when(qs + block_q - 1 >= ks)(_accum)
    else:
        _accum()


def _flash_gqa_bwd(
    q,  # [B, Hq, T, D]
    k,  # [B, Hkv, S, D]
    v,
    o,  # [B, Hq, T, D]
    lse,  # [B, Hq, T_pad] f32
    do,  # [B, Hq, T, D]
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    groups: int,
):
    B, Hq, T, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    t_pad = pl.cdiv(T, block_q) * block_q
    s_pad = pl.cdiv(S, block_k) * block_k
    if t_pad != T:
        pad = ((0, 0), (0, 0), (0, t_pad - T), (0, 0))
        q, o, do = jnp.pad(q, pad), jnp.pad(o, pad), jnp.pad(do, pad)
    if s_pad != S:
        pad = ((0, 0), (0, 0), (0, s_pad - S), (0, 0))
        k, v = jnp.pad(k, pad), jnp.pad(v, pad)

    # delta = rowsum(dO * O): tiny elementwise reduction, XLA fuses it
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)[..., None]

    grid_q = (B, Hkv, groups, t_pad // block_q)
    dq = pl.pallas_call(
        functools.partial(
            _flash_dq_kernel, scale=scale, causal=causal, block_k=block_k, kv_len=S
        ),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec(
                (None, None, block_q, D), lambda b, h, g, i: (b, h * groups + g, i, 0)
            ),
            pl.BlockSpec((None, None, s_pad, D), lambda b, h, g, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, s_pad, D), lambda b, h, g, i: (b, h, 0, 0)),
            pl.BlockSpec(
                (None, None, block_q, D), lambda b, h, g, i: (b, h * groups + g, i, 0)
            ),
            pl.BlockSpec(
                (None, None, block_q, 1), lambda b, h, g, i: (b, h * groups + g, i, 0)
            ),
            pl.BlockSpec(
                (None, None, block_q, 1), lambda b, h, g, i: (b, h * groups + g, i, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, None, block_q, D), lambda b, h, g, i: (b, h * groups + g, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, t_pad, D), q.dtype),
        interpret=INTERPRET,
    )(q, k, v, do, lse, delta)

    grid_kv = (B, Hq, s_pad // block_k, t_pad // block_q)
    dk_p, dv_p = pl.pallas_call(
        functools.partial(
            _flash_dkv_kernel, scale=scale, causal=causal, block_q=block_q, kv_len=S
        ),
        grid=grid_kv,
        in_specs=[
            pl.BlockSpec((None, None, block_q, D), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec(
                (None, None, block_k, D), lambda b, h, j, i: (b, h // groups, j, 0)
            ),
            pl.BlockSpec(
                (None, None, block_k, D), lambda b, h, j, i: (b, h // groups, j, 0)
            ),
            pl.BlockSpec((None, None, block_q, D), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, block_q, 1), lambda b, h, j, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, block_q, 1), lambda b, h, j, i: (b, h, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, None, block_k, D), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((None, None, block_k, D), lambda b, h, j, i: (b, h, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, s_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, s_pad, D), jnp.float32),
        ),
        interpret=INTERPRET,
    )(q, k, v, do, lse, delta)
    # sum per-q-head partials over each GQA group in f32
    dk = dk_p.reshape(B, Hkv, groups, s_pad, D).sum(2).astype(k.dtype)
    dv = dv_p.reshape(B, Hkv, groups, s_pad, D).sum(2).astype(v.dtype)
    return dq[:, :, :T], dk[:, :, :S], dv[:, :, :S]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_core(q, k, v, causal, scale, block_q, block_k, groups):
    # primal (no-grad) path: implicit edge padding, no HBM pad ops
    out, _ = _flash_gqa(
        q, k, v, causal=causal, scale=scale, block_q=block_q, block_k=block_k,
        groups=groups, pad_inputs=False,
    )
    return out


def _flash_core_fwd(q, k, v, causal, scale, block_q, block_k, groups):
    out, lse = _flash_gqa(
        q, k, v, causal=causal, scale=scale, block_q=block_q, block_k=block_k, groups=groups
    )
    return out, (q, k, v, out, lse)


def _flash_core_bwd(causal, scale, block_q, block_k, groups, res, do):
    q, k, v, o, lse = res
    dq, dk, dv = _flash_gqa_bwd(
        q, k, v, o, lse, do,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k, groups=groups,
    )
    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, T, Hq, D]
    k: jnp.ndarray,  # [B, S, Hkv, D]
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    causal: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention for the causal self-attention prefill path.

    Only the dense-causal (optionally right-padded) case is supported here;
    anything needing an arbitrary mask falls back to the XLA path by raising
    NotImplementedError (caught in models/attention.py).
    """
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    if causal is None:
        causal = T == S  # prefill
    if not causal and mask is not None:
        # non-causal runs as FULL attention over kv_len; anything needing a
        # real mask stays on the XLA path
        raise NotImplementedError("arbitrary masks use the XLA path")
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    if (
        not causal and T == S and S <= 1024
        and Hq == Hkv
        # narrow lane-blocks (e.g. D=64 -> 128 lanes) use the head-blocked
        # kernel; a fat minimal block (D=72 -> 1152 lanes) must equal the
        # whole packed dim and stay under VMEM, and uses the seq-q variant
        and (
            (_nhd_head_block(D) * D <= 256 and Hq % _nhd_head_block(D) == 0)
            or (_nhd_head_block(D) == Hq and Hq * D <= 2048)
        )
    ):
        # ViT-tower full attention: layout-native kernel, no transposes/pads
        return _flash_full_nhd(q, k, v, scale, 1)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    def pick_block(n: int, default: int) -> int:
        # Short sequences (ViT towers: 729/730 tokens) run as ONE block sized
        # to the 128-rounded length — a pow2-padded 1024 block wastes 40% of
        # the attention FLOPs (measured: the tower flash calls were 24% of
        # tower time at ~13% MFU before this, PERF.md).
        if n <= 1024:
            return max(128, ((n + 127) // 128) * 128)
        return default

    out = _flash_core(
        qt,
        kt,
        vt,
        causal,
        scale,
        pick_block(T, DEFAULT_BLOCK_Q),
        pick_block(S, DEFAULT_BLOCK_K),
        Hq // Hkv,
    )
    return out.transpose(0, 2, 1, 3)
