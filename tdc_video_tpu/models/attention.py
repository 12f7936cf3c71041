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
