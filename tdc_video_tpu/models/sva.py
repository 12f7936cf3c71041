"""SVA — Spatial Vision Aggregator (Cambrian-1 connector).

Re-implements the behavior of tdc/vision_sampler.py:519 (VisionTokenSampler of
VisionCrossAttentionLayer blocks) + the per-tower aux projectors and group
query setup from tdc/cambrian_arch.py:55-146.

Layout redesign for TPU: the reference flattens (batch x query_pos) into one
huge batch of 1-query attentions over rf^2-token windows
(cambrian_arch.py:1045-1052 + vision_sampler.py:215-291).  Here the window
structure is kept as tensor dimensions — queries [B, Nq, 1, D] attend to
windows [B, Nq, T*rf^2, D] via a single batched einsum per layer, which XLA
maps onto the MXU without reshuffling, and which the Pallas fused
cross-attention kernel can consume directly.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..config import SVAConfig
from .layers import (
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    normal_init,
)

Params = Any


def _init_ln_linear(key, d_in, d_out, dtype):
    return {
        "norm": init_layer_norm(d_in, dtype),
        "lin": init_linear(key, d_in, d_out, dtype, bias=False),
    }


def _ln_linear(p, x, eps=1e-5):
    return linear(p["lin"], layer_norm(p["norm"], x, eps))


def _init_layer(key, cfg: SVAConfig, rf_list: Sequence[int], dtype):
    d = cfg.vision_hidden_size
    ks = jax.random.split(key, 8 + 2 * len(rf_list))
    p = {
        "proj_context": init_linear(ks[0], d, d, dtype, bias=False),
        "proj_in": init_linear(ks[1], 2 * d, d, dtype, bias=False),
        "q_proj": _init_ln_linear(ks[2], d, d, dtype),
        "o_proj": init_linear(ks[3], d, d, dtype, bias=False),
        "norm": init_layer_norm(d, dtype),
        "proj_out": {
            "fc1": init_linear(ks[4], d, d, dtype, bias=False),
            "fc2": init_linear(ks[5], d, d, dtype, bias=False),
        },
        "kv": [],
        "pos_embed": [],
    }
    for i, rf in enumerate(rf_list):
        p["kv"].append(
            {
                "k_proj": _init_ln_linear(ks[6 + 2 * i], d, d, dtype),
                "v_proj": _init_ln_linear(ks[7 + 2 * i], d, d, dtype),
            }
        )
        p["pos_embed"].append(
            normal_init(ks[-1], (rf * rf, d), dtype) if rf > 1 else None
        )
    return p


def init_sampler(key, cfg: SVAConfig, rf_list: Sequence[int], depth: int, dtype=jnp.float32):
    keys = jax.random.split(key, depth)
    return {"layers": [_init_layer(k, cfg, rf_list, dtype) for k in keys]}


def init_sva(key, cfg: SVAConfig, tower_dims: Sequence[int], llm_hidden: int, dtype=jnp.float32):
    """All SVA-side params: aux projectors, per-group samplers, vision_query,
    mm_projector (cambrian_arch.py:62-146)."""
    ks = jax.random.split(key, 4 + len(tower_dims) + cfg.num_query_group)
    d = cfg.vision_hidden_size
    params: dict = {"aux_projectors": [], "samplers": []}
    for i, td in enumerate(tower_dims):
        k1, k2 = jax.random.split(ks[i])
        params["aux_projectors"].append(
            {
                "fc1": init_linear(k1, td, d, dtype),
                "fc2": init_linear(k2, d, d, dtype),
                "norm": init_layer_norm(d, dtype),
            }
        )
    for g in range(cfg.num_query_group):
        rf_list = [
            int(tl**0.5) // int(cfg.query_num_list[g] ** 0.5)
            for tl in cfg.tower_token_len_list
        ]
        params["samplers"].append(
            init_sampler(ks[len(tower_dims) + g], cfg, rf_list, cfg.connector_depth, dtype)
        )
    params["vision_query"] = normal_init(ks[-3], (cfg.num_query_group, d), dtype)
    k1, k2 = jax.random.split(ks[-2])
    params["mm_projector"] = {
        "fc1": init_linear(k1, d * cfg.num_query_group, llm_hidden, dtype),
        "fc2": init_linear(k2, llm_hidden, llm_hidden, dtype),
    }
    return params


def aux_project(p: Params, feats: jnp.ndarray) -> jnp.ndarray:
    """Per-tower projector: Linear-GELU-Linear-LayerNorm (cambrian_arch.py:84-89)."""
    h = jax.nn.gelu(linear(p["fc1"], feats), approximate=True)
    h = linear(p["fc2"], h)
    return layer_norm(p["norm"], h)


def mm_project(p: Params, feats: jnp.ndarray) -> jnp.ndarray:
    """Final projector: Linear-GELU-Linear into the LLM space (cambrian_arch.py:65-69)."""
    return linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], feats), approximate=True))


def rearrange_windows(feats: jnp.ndarray, query_side: int) -> jnp.ndarray:
    """[B, S*S, D] tower grid -> [B, Nq, rf^2, D] per-query-location windows
    (reference rearrange_vision_tower_features_* at cambrian_arch.py:556-697)."""
    B, N, D = feats.shape
    side = int(N**0.5)
    rf = side // query_side
    x = feats.reshape(B, query_side, rf, query_side, rf, D)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, query_side * query_side, rf * rf, D)


def _sampler_layer(
    cfg: SVAConfig,
    p: Params,
    queries: jnp.ndarray,  # [B, Nq, 1, D]
    context: jnp.ndarray,  # [B, 1, D]
    windows: List[jnp.ndarray],  # per tower [B, Nq, rf^2, D]
    masks: Optional[List[Optional[jnp.ndarray]]],  # per tower [B, Nq, rf^2] bool
) -> jnp.ndarray:
    B, Nq, _, D = queries.shape
    nh = cfg.num_heads
    hd = D // nh

    residual = queries
    ctx = linear(p["proj_context"], context)[:, None]  # [B, 1, 1, D]
    ctx = jnp.broadcast_to(ctx, (B, Nq, 1, D))
    q = jnp.concatenate([queries, ctx], axis=-1)
    q = linear(p["proj_in"], q)  # [B, Nq, 1, D]

    qh = _ln_linear(p["q_proj"], q).reshape(B, Nq, 1, nh, hd)
    ks, vs, ms = [], [], []
    for i, w in enumerate(windows):
        wp = w
        if p["pos_embed"][i] is not None:
            wp = w + p["pos_embed"][i].astype(w.dtype)[None, None]
        ks.append(_ln_linear(p["kv"][i]["k_proj"], wp))
        vs.append(_ln_linear(p["kv"][i]["v_proj"], wp))
        if masks is not None and masks[i] is not None:
            ms.append(masks[i])
        else:
            ms.append(jnp.ones(w.shape[:3], jnp.bool_))
    k = jnp.concatenate(ks, axis=2).reshape(B, Nq, -1, nh, hd)
    v = jnp.concatenate(vs, axis=2).reshape(B, Nq, -1, nh, hd)
    m = jnp.concatenate(ms, axis=2)  # [B, Nq, Skv]

    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    logits = jnp.einsum("bnqhd,bnshd->bnhqs", qh, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    logits = jnp.where(m[:, :, None, None, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("bnhqs,bnshd->bnqhd", probs.astype(v.dtype), v)
    attn = attn.reshape(B, Nq, 1, D)
    attn = linear(p["o_proj"], attn)

    q = q + attn
    q = layer_norm(p["norm"], q, 1e-5)
    q = linear(p["proj_out"]["fc2"], jax.nn.gelu(linear(p["proj_out"]["fc1"], q), approximate=True))
    return q + residual


def sampler_forward(
    cfg: SVAConfig,
    p: Params,
    queries: jnp.ndarray,  # [B, Nq, D]
    context: jnp.ndarray,  # [B, 1, D] global context feature
    windows: List[jnp.ndarray],
    masks: Optional[List[Optional[jnp.ndarray]]] = None,
) -> jnp.ndarray:
    q = queries[:, :, None, :]
    for layer in p["layers"]:
        q = _sampler_layer(cfg, layer, q, context, windows, masks)
    return q[:, :, 0, :]


def sva_forward(
    cfg: SVAConfig,
    params: Params,
    tower_feats: List[jnp.ndarray],  # per tower [B, 576, C_tower]
    masks: Optional[List[Optional[jnp.ndarray]]] = None,
) -> jnp.ndarray:
    """Full SVA: project towers, build query grid, run sampler groups, concat,
    project to LLM hidden.  Returns [B, image_token_len, llm_hidden].

    Mirrors cambrian_arch.py:998-1150 (sva branch) with tower-0 mean as the
    global context feature.
    """
    projected = [
        aux_project(params["aux_projectors"][i], f) for i, f in enumerate(tower_feats)
    ]
    B = projected[0].shape[0]
    context = projected[0].mean(axis=1, keepdims=True)  # [B, 1, D]

    group_outputs = []
    for g in range(cfg.num_query_group):
        nq = cfg.query_num_list[g]
        side = int(nq**0.5)
        queries = jnp.broadcast_to(
            params["vision_query"][g][None, None], (B, nq, cfg.vision_hidden_size)
        ).astype(projected[0].dtype)
        windows = [rearrange_windows(f, side) for f in projected]
        win_masks = None
        if masks is not None:
            win_masks = [
                rearrange_windows(m[..., None].astype(jnp.float32), side)[..., 0] > 0.5
                if m is not None
                else None
                for m in masks
            ]
        out = sampler_forward(cfg, params["samplers"][g], queries, context, windows, win_masks)
        if side != cfg.final_side_len:
            from .vit import bilinear_resize_tokens

            out = bilinear_resize_tokens(out, side, cfg.final_side_len)
        group_outputs.append(out)

    feats = jnp.concatenate(group_outputs, axis=-1)
    return mm_project(params["mm_projector"], feats)
