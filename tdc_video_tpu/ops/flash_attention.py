"""Pallas flash-attention kernel (TPU).

TPU-native replacement for the reference's external flash-attn-2 CUDA
dependency (tdc/builder.py:71-72).  Online-softmax tiling over the KV axis so
long video prefill (thousands of tokens) never materializes the [T, S] score
matrix in HBM.

The kernel operates on one (batch, head-group) slice per grid step and tiles
Q x KV blocks through VMEM.  GQA is handled by folding the query-head group
into the Q block row dimension.
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


def _flash_kernel(
    q_ref,  # [BLOCK_Q, D]
    k_ref,  # [S, D]
    v_ref,  # [S, D]
    o_ref,  # [BLOCK_Q, D]
    *,
    scale: float,
    causal: bool,
    block_k: int,
    q_offset_blocks: int,
    kv_len: int,
):
    block_q, d = q_ref.shape
    q = q_ref[:].astype(jnp.float32) * scale
    qi = pl.program_id(2) * block_q  # absolute start row of this Q block

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    num_kb = pl.cdiv(kv_len, block_k)

    def body(kb, carry):
        m, l, acc = carry
        ks = kb * block_k
        k_blk = k_ref[pl.ds(ks, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(ks, block_k), :].astype(jnp.float32)
        s = q @ k_blk.T  # [BLOCK_Q, BLOCK_K]

        row = qi + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        col = ks + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col < kv_len
        if causal:
            mask = mask & (col <= row)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + p @ v_blk
        return m_new, l, acc

    if causal:
        # Only iterate KV blocks that can contain unmasked entries.
        last_row = qi + block_q - 1
        num_kb_needed = jnp.minimum(num_kb, (last_row // block_k) + 1)
    else:
        num_kb_needed = num_kb
    m, l, acc = jax.lax.fori_loop(0, num_kb_needed, body, (m, l, acc))

    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q", "block_k"))
def _flash_mha(
    q: jnp.ndarray,  # [B, H, T, D]
    k: jnp.ndarray,  # [B, H, S, D]
    v: jnp.ndarray,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
) -> jnp.ndarray:
    B, H, T, D = q.shape
    S = k.shape[2]
    t_pad = pl.cdiv(T, block_q) * block_q
    s_pad = pl.cdiv(S, block_k) * block_k
    if t_pad != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    if s_pad != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))

    grid = (B, H, t_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            scale=scale,
            causal=causal,
            block_k=block_k,
            q_offset_blocks=0,
            kv_len=S,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, s_pad, D), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, s_pad, D), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.ANY
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, t_pad, D), q.dtype),
    )(q, k, v)
    return out[:, :, :T]


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
    if mask is not None and not causal:
        raise NotImplementedError("arbitrary masks use the XLA path")
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    if Hkv != Hq:
        k = jnp.repeat(k, Hq // Hkv, axis=2)
        v = jnp.repeat(v, Hq // Hkv, axis=2)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _flash_mha(
        qt,
        kt,
        vt,
        causal=causal,
        scale=scale,
        block_q=min(DEFAULT_BLOCK_Q, max(128, T)),
        block_k=min(DEFAULT_BLOCK_K, max(128, S)),
    )
    return out.transpose(0, 2, 1, 3)
