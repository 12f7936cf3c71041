"""Shared functional building blocks.

All modules in this framework are pure functions over parameter pytrees
(nested dicts of jnp arrays).  `init_*` functions build the tree, `*_apply`
functions consume it.  This keeps everything trivially compatible with
jax.jit / pjit / shard_map and makes weight conversion from the torch
reference checkpoints a plain tree-mapping exercise.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp


Params = Any  # nested dict of arrays


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def normal_init(key, shape, dtype, stddev=0.02):
    return (jax.random.normal(key, shape, jnp.float32) * stddev).astype(dtype)


def lecun_init(key, shape, dtype):
    fan_in = shape[0] if len(shape) >= 2 else max(1, shape[-1])
    return (jax.random.normal(key, shape, jnp.float32) / math.sqrt(fan_in)).astype(dtype)


def init_linear(key, d_in, d_out, dtype, bias=True, stddev=None):
    kw, _ = jax.random.split(key)
    w = (
        normal_init(kw, (d_in, d_out), dtype, stddev)
        if stddev is not None
        else lecun_init(kw, (d_in, d_out), dtype)
    )
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def int8_qact(
    x: jnp.ndarray, scale: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization of activations: [..., D] float ->
    (int8 [..., D], f32 scale).  Kept separate from the dot so one
    quantization feeds every consumer of the same activation (q/k/v share
    their LN output — 1 amax+round instead of 3).

    scale=None: dynamic per-row (per-token) scales from an amax pass.  On
    compute-bound paths that amax is a full extra HBM read of the activation
    (and blocks the round/clip from fusing into the producer — measured
    ~12% of the int8 DINO tower, PERF.md).
    scale=<scalar>: static calibrated scale (models/quant.py
    calibrate_vit_act_scales); no reduction, so XLA fuses the whole
    round/clip/convert chain into the producing fusion and the s8 tensor is
    written directly."""
    xf = x.astype(jnp.float32)
    if scale is None:
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        x_scale = jnp.maximum(amax / 127.0, 1e-8)
    else:
        x_scale = scale.astype(jnp.float32)
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    return x_q, x_scale


def int8_dot(
    x_q: jnp.ndarray, x_scale: jnp.ndarray, p: Params, out_dtype
) -> jnp.ndarray:
    """s8 x s8 -> s32 dot on the MXU (~2x bf16 throughput on v5e) with the
    row and column scales applied to the s32 product; bias in out_dtype."""
    y = jax.lax.dot_general(
        x_q, p["w_q"], (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * x_scale * p["w_scale"].astype(jnp.float32)
    y = y.astype(out_dtype)
    if "b" in p:
        y = y + p["b"].astype(out_dtype)
    return y


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray) -> jnp.ndarray:
    """Dynamic-activation-quantized int8 matmul (quantize + dot in one call).
    This is the AQT-style serving recipe: per-token activation scales bound
    the quantization error of outlier tokens without per-channel act
    statistics.  x: [..., D] float; w_q: int8 [D, F]; w_scale: f32 [F]."""
    x_q, x_scale = int8_qact(x)
    return int8_dot(x_q, x_scale, {"w_q": w_q, "w_scale": w_scale}, x.dtype)


def linear(p: Params, x: jnp.ndarray, dtype=None, act_quant: bool = False) -> jnp.ndarray:
    """Matmul in the activation dtype: params stored in param_dtype (often
    f32) are cast down so bf16 activations stay bf16 on the MXU instead of
    silently promoting the whole network to f32.

    int8 weights (models/quant.py) dispatch on the "w_q" key, two modes:
    * act_quant=False (LM decode): weight-only — the int8 weight is converted
      in-register (XLA fuses the convert into the dot's operand load — HBM
      streams int8 bytes) and the per-output-channel scale is applied to the
      product.  Right for bandwidth-bound paths; compute stays bf16.
    * act_quant=True (ViT towers): activations are dynamically quantized
      per-row and the dot runs s8 x s8 -> s32 on the MXU at ~2x bf16
      throughput.  Right for compute-bound paths.  A no-op for float
      weights."""
    if dtype is not None:
        x = x.astype(dtype)
    if "w_q" in p:
        if act_quant:
            y = int8_matmul(x, p["w_q"], p["w_scale"].astype(jnp.float32))
        else:
            y = x @ p["w_q"].astype(x.dtype)
            y = y * p["w_scale"].astype(y.dtype)
        if "lora_a" in p:
            # QLoRA-style training: LoRA deltas ride on a frozen int8 base
            # (train/trainer.py quantize_frozen).  The delta path stays
            # full-precision; gradients flow to A/B through the two thin
            # gemms while the int8 weight is a constant.
            y = y + (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y
    w = p["w"].astype(x.dtype)
    y = x @ w
    if "lora_a" in p:
        # runtime LoRA (train/lora.graft_lora): y += (x @ A) @ B_scaled as
        # two thin gemms.  Materializing merged weights in-graph instead
        # (apply_lora) holds a full f32 delta + a second copy of the LM —
        # measured +12 GB at 3B, the difference between stage-3 fitting one
        # v5e chip and OOM (PERF.md round 5).
        y = y + (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def init_layer_norm(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_rms_norm(d, dtype):
    return {"scale": jnp.ones((d,), dtype)}


def rms_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------


def init_gelu_mlp(key, d_model, d_ff, dtype, bias=True):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, d_model, d_ff, dtype, bias=bias),
        "fc2": init_linear(k2, d_ff, d_model, dtype, bias=bias),
    }


def gelu_mlp(p: Params, x: jnp.ndarray, approximate: bool = True) -> jnp.ndarray:
    h = linear(p["fc1"], x)
    h = jax.nn.gelu(h, approximate=approximate)
    return linear(p["fc2"], h)


def init_swiglu_mlp(key, d_model, d_ff, dtype, bias=False):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate": init_linear(k1, d_model, d_ff, dtype, bias=bias),
        "up": init_linear(k2, d_model, d_ff, dtype, bias=bias),
        "down": init_linear(k3, d_ff, d_model, dtype, bias=bias),
    }


def swiglu_mlp(p: Params, x: jnp.ndarray, act_quant: bool = False) -> jnp.ndarray:
    if act_quant and "w_q" in p["gate"]:
        # one shared activation quantization feeds both gate and up
        xq, xs = int8_qact(x)
        h = jax.nn.silu(int8_dot(xq, xs, p["gate"], x.dtype)) * int8_dot(
            xq, xs, p["up"], x.dtype
        )
        return linear(p["down"], h, act_quant=True)
    return linear(p["down"], jax.nn.silu(linear(p["gate"], x)) * linear(p["up"], x))


# ---------------------------------------------------------------------------
# Rotary position embeddings
# ---------------------------------------------------------------------------


def rope_inv_freq(
    head_dim: int,
    theta: float,
    scaling: Optional[Tuple[float, float, float, int]] = None,
) -> jnp.ndarray:
    """Inverse frequencies, with optional Llama-3-style NTK-by-parts scaling."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if scaling is not None:
        factor, low_ff, high_ff, orig_ctx = scaling
        low_wl = orig_ctx / low_ff
        high_wl = orig_ctx / high_ff
        wl = 2.0 * jnp.pi / inv
        smooth = (orig_ctx / wl - low_ff) / (high_ff - low_ff)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = jnp.where(
            wl > low_wl,
            inv / factor,
            jnp.where(wl < high_wl, inv, (1 - smooth) * inv / factor + smooth * inv),
        )
        inv = scaled
    return inv


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray):
    """positions [*, T] -> cos/sin [*, T, head_dim] (half-rotation layout)."""
    freqs = positions[..., None].astype(jnp.float32) * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [..., T, H, D]; cos/sin [..., T, D] (broadcast over heads)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention (XLA path; the Pallas flash kernel lives in ops/flash_attention.py
# and is dispatched by models/attention.py)
# ---------------------------------------------------------------------------


def sdpa(
    q: jnp.ndarray,  # [B, T, Hq, D]
    k: jnp.ndarray,  # [B, S, Hkv, D]
    v: jnp.ndarray,  # [B, S, Hkv, D]
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, Hq, T, S], True = keep
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped-query scaled dot-product attention with f32 softmax."""
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    group = Hq // Hkv
    qg = q.reshape(B, T, Hkv, group, D)
    logits = jnp.einsum("bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        m = jnp.broadcast_to(mask, (B, Hq, T, S)).reshape(B, Hkv, group, T, S)
        logits = jnp.where(m, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", probs.astype(v.dtype), v)
    return out.reshape(B, T, Hq, D)


def sdpa_int8kv(
    q: jnp.ndarray,  # [B, T, Hq, D]
    k_q: jnp.ndarray,  # [B, S, Hkv, D] int8
    k_scale: jnp.ndarray,  # [B, S, Hkv] f32
    v_q: jnp.ndarray,  # [B, S, Hkv, D] int8
    v_scale: jnp.ndarray,  # [B, S, Hkv] f32
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, Hq, T, S]
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """GQA attention reading an int8 KV cache WITHOUT materializing the
    dequantized cache: the per-token-per-head scales commute out of the
    contraction over D, so they apply to the scores (k) and to the softmax
    probs (v) instead.  The int8->bf16 convert then fuses into the dot's
    operand load and HBM streams int8 bytes — materializing
    `k_q.astype(bf16) * scale` as a tensor would WRITE+READ a full bf16
    cache every decode step and run slower than a bf16 cache (measured:
    70 vs 79 tok/s at 6k, PERF.md)."""
    B, T, Hq, D = q.shape
    S, Hkv = k_q.shape[1], k_q.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    group = Hq // Hkv
    qg = q.reshape(B, T, Hkv, group, D)
    logits = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k_q.astype(q.dtype), preferred_element_type=jnp.float32
    )
    logits = logits * (scale * k_scale.transpose(0, 2, 1))[:, :, None, None, :]
    if mask is not None:
        m = jnp.broadcast_to(mask, (B, Hq, T, S)).reshape(B, Hkv, group, T, S)
        logits = jnp.where(m, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    pv = probs * v_scale.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bhgts,bshd->bthgd", pv.astype(q.dtype), v_q.astype(q.dtype))
    return out.reshape(B, T, Hq, D)


def make_causal_mask(T: int, S: int, offset: int = 0) -> jnp.ndarray:
    """[T, S] boolean mask; query i attends keys j <= i + offset."""
    qi = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    return kj <= qi + offset
