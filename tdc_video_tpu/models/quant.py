"""Weight-only int8 quantization for the serving decode path.

Autoregressive decode is HBM-bandwidth-bound: every token streams the full
LM weight set (6.4 GB bf16 for Llama-3.2-3B -> ~128 tok/s roofline on a v5e,
PERF.md).  Symmetric per-output-channel int8 halves the weight bytes, so the
decode roofline doubles; the matmul runs as int8-loaded, bf16-converted
operands with the channel scale applied to the output — XLA fuses the
convert into the dot's operand load, so HBM sees only int8.

This replaces the reference's bitsandbytes 4/8-bit loading options
(tdc/builder.py:58-67, CUDA-only) with a TPU-native path.  Weight-only
(activations stay bf16): the standard accuracy-safe serving quantization.

Usage:
    params["lm"] = quantize_lm_int8(params["lm"])   # after load, before jit
    # layers.linear dispatches on the "w_q" key; all call sites unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = Any


def quantize_linear_int8(p: Params) -> Params:
    """{"w": [in, out], "b"?} -> {"w_q": int8, "w_scale": [out], "b"?}."""
    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)  # per output channel
    scale = jnp.maximum(amax / 127.0, 1e-8)
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "w_scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _is_linear(p) -> bool:
    return isinstance(p, dict) and "w" in p and p["w"].ndim >= 2


def quantize_tree_int8(params: Params, skip=()) -> Params:
    """Quantize every linear in a module tree (stacked-layer [L, in, out]
    leaves keep their leading axis; scales follow).  `skip` is a set of
    top-level subtree names to leave untouched."""

    def rec(tree, path=()):
        if _is_linear(tree) and path[:1] not in {(s,) for s in skip}:
            w = tree["w"]
            if w.ndim == 3:  # stacked layers [L, in, out]
                ws = w.astype(jnp.float32)
                amax = jnp.max(jnp.abs(ws), axis=1)  # [L, out]
                scale = jnp.maximum(amax / 127.0, 1e-8)
                w_q = jnp.clip(jnp.round(ws / scale[:, None, :]), -127, 127).astype(jnp.int8)
                out = {"w_q": w_q, "w_scale": scale.astype(jnp.float32)}
                if "b" in tree:
                    out["b"] = tree["b"]
                return out
            return quantize_linear_int8(tree)
        if isinstance(tree, dict):
            return {k: rec(v, path + (k,)) for k, v in tree.items()}
        return tree

    return rec(params)


def quantize_lm_int8(lm_params: Params, include_head: bool = True) -> Params:
    """LM projections -> weight-only int8 (decode is HBM-bound; see module
    docstring).  The embedding table stays bf16/f32 — it is gathered, not
    streamed, per token."""
    skip = ("embed",) if include_head else ("embed", "lm_head")
    return quantize_tree_int8(lm_params, skip=skip)


def quantize_vit_int8(vit_params: Params, act_scales: Params = None) -> Params:
    """ViT tower -> int8 for MXU int8 COMPUTE (models/layers.int8_matmul):
    the towers are compute-bound (PERF.md: 97% of encode+compress at ~44%
    bf16 MFU), so unlike the LM the win here comes from the s8 x s8 dot
    running at ~2x bf16 MXU throughput.  LayerNorm / softmax / LayerScale /
    pos-embed stay float.  Replaces the bf16 tower forward of the reference
    (/root/reference/tdc/cambrian_arch.py:698-745) at serving time.

    act_scales=None: activations are quantized dynamically per token.
    act_scales=<tree from calibrate_vit_act_scales>: static W8A8 — the
    per-layer scales ride the layer scan and the dynamic amax pass (an
    extra full HBM read per site) disappears (PERF.md round 3)."""
    out = quantize_tree_int8(vit_params)
    if act_scales is not None:
        out["layers"] = dict(
            out["layers"],
            act_scale={k: v.astype(jnp.float32) for k, v in act_scales.items()},
        )
    return out


def calibrate_vit_act_scales(
    cfg, vit_params: Params, pixels: jnp.ndarray, attn_impl: str = "xla",
    dtype=jnp.bfloat16, margin: float = 1.05,
) -> Params:
    """Static W8A8 calibration for a ViT tower: run the FLOAT tower on a
    representative pixel batch, take per-layer per-site activation amaxes,
    and derive symmetric int8 scales ({"qkv","attn","mlp","down"}: f32 [L]).
    `margin` leaves headroom for eval-time tokens slightly outside the
    calibration range (beyond it, values clip at +-127 like every static
    W8A8 deployment).  Feed the result to quantize_vit_int8(act_scales=...)."""
    from .vit import vit_forward

    _, stats = jax.jit(
        lambda p, px: vit_forward(
            cfg, p, px, interpolate=False, attn_impl=attn_impl, dtype=dtype,
            calibrate=True,
        )
    )(vit_params, pixels)
    return {
        k: jnp.maximum(v.astype(jnp.float32) * margin / 127.0, 1e-8)
        for k, v in stats.items()
    }


def dequantize_linear(p: Params, dtype=jnp.float32) -> Params:
    """Inverse (tests / export): w = w_q * scale."""
    w = p["w_q"].astype(jnp.float32) * p["w_scale"][..., None, :]
    out = {"w": w.astype(dtype)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def dequantize_tree_int8(params: Params, dtype=jnp.float32) -> Params:
    """Walk a module tree and invert every int8 linear back to float
    ({"w_q", "w_scale"} -> {"w"}).  Used at export time for QLoRA-style
    training (train/trainer.py quantize_frozen): merge_lora_params needs
    float "w" leaves to bake the deltas into, and merging into the
    dequantized values matches the weights the adapter was trained against.
    Non-linear leaves (act_scale tables, norms, embeddings) pass through."""

    def rec(tree):
        if isinstance(tree, dict):
            if "w_q" in tree:
                out = dequantize_linear(tree, dtype=dtype)
                for k, v in tree.items():
                    if k not in ("w_q", "w_scale", "b"):
                        out[k] = v
                return out
            return {k: rec(v) for k, v in tree.items()}
        return tree

    return rec(params)
