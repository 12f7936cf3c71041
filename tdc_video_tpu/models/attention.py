"""Attention dispatch: Pallas flash kernel on TPU, XLA einsum elsewhere.

Replaces the reference's flash-attn-2 / torch SDPA switch
(tdc/builder.py:71-72, tdc/vision_sampler.py:123-128) with a TPU-native
dispatch.  The flash path (ops/flash_attention.py) serves long causal
(right-padded) prefill self-attention; short decode steps and tiny
cross-attentions stay on the XLA path where the MXU is already well
utilized.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .layers import sdpa


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def default_attn_impl() -> str:
    """Platform default: the Pallas flash kernel (fwd + custom_vjp bwd) on
    TPU, XLA attention elsewhere — mirrors the reference's flash-attn-2
    opt-in (tdc/builder.py:71-72) but as an automatic default."""
    return "flash" if _on_tpu() else "xla"


def _check_causal_mask(mask: jnp.ndarray, T: int, S: int) -> None:
    """Debug guard for the flash path's invariant: with `causal=True` the mask
    must equal causal-over-right-padded keys (the kernel drops the mask and
    computes causal attention implicitly).  Only checkable on concrete arrays
    — under jit the mask is a tracer and callers carry the invariant (every
    causal caller right-pads; see lm.lm_forward).  A left-padded or packed
    mask fails loudly here instead of silently attending wrong."""
    import numpy as np

    m = np.broadcast_to(np.asarray(mask), mask.shape[:-2] + (T, S)).reshape(-1, T, S)
    key_valid = m[:, T - 1, :]  # last query row sees every valid key
    lens = key_valid.sum(-1)
    if not (key_valid.cumsum(-1) <= lens[:, None]).all() or not (
        key_valid == (np.arange(S)[None] < lens[:, None])
    ).all():
        raise ValueError("flash causal path requires right-padded keys")
    expected = np.tril(np.ones((T, S), bool))[None] & key_valid[:, None, :]
    if not (m == expected).all():
        raise ValueError(
            "flash causal path requires mask == causal & right-padding"
        )


def attention(
    q: jnp.ndarray,  # [B, T, Hq, D]
    k: jnp.ndarray,  # [B, S, Hkv, D]
    v: jnp.ndarray,  # [B, S, Hkv, D]
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, Hq, T, S]
    impl: str = "xla",
    scale: Optional[float] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """`causal=True` asserts the mask is exactly causal-over-right-padded
    rows, which the flash kernel implements implicitly; mask=None non-causal
    (ViT full attention) also takes the flash path; any other mask shape uses
    XLA."""
    if (
        impl == "flash"
        and causal
        and mask is not None
        and not isinstance(mask, jax.core.Tracer)
    ):
        _check_causal_mask(mask, q.shape[1], k.shape[1])
    if (
        impl == "flash"
        and _on_tpu()
        and q.shape[1] >= 128
        and (causal or mask is None)
    ):
        from ..ops.flash_attention import flash_attention

        try:
            return flash_attention(q, k, v, scale=scale, causal=causal)
        except NotImplementedError:
            pass
    return sdpa(q, k, v, mask=mask, scale=scale)
