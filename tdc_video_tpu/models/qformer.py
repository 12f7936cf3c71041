"""TDC Q-Former: BERT with interleaved cross-attention (the compressor).

Re-implements the behavior of the reference's BLIP-2-lineage Q-Former
(tdc/Qformer.py; built by init_Qformer at tdc/cambrian_arch.py:403-424 with
cross_attention_freq=2 and encoder_width = LLM hidden size):

* input sequence = [query_embeds ; word+pos text embeddings], LayerNorm'd
  together (Qformer.py:85-108);
* every layer: bidirectional post-LN self-attention over the full sequence;
* every `cross_attention_freq`-th layer: the first `query_length` positions
  additionally cross-attend to `encoder_hidden_states` (Qformer.py:429-447);
* FFN is split: query positions go through intermediate_query/output_query,
  text positions through intermediate/output (Qformer.py:449-462).

The TPU-native difference is in how it is *called*: compress/tdc.py batches
every 8-frame chunk of every segment into one [num_chunks, ...] Q-Former pass
instead of the reference's per-chunk Python loop (cambrian_arch.py:1603-1692),
turning many small matmuls into large MXU-shaped ones.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import QFormerConfig
from .attention import attention
from .layers import init_layer_norm, init_linear, layer_norm, linear, normal_init

Params = Any


def _init_attn(key, cfg: QFormerConfig, kv_dim: int, dtype):
    ks = jax.random.split(key, 4)
    d = cfg.hidden_size
    return {
        "q_proj": init_linear(ks[0], d, d, dtype),
        "k_proj": init_linear(ks[1], kv_dim, d, dtype),
        "v_proj": init_linear(ks[2], kv_dim, d, dtype),
        "o_proj": init_linear(ks[3], d, d, dtype),
        "norm": init_layer_norm(d, dtype),
    }


def _init_ffn(key, cfg: QFormerConfig, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, cfg.hidden_size, cfg.intermediate_size, dtype),
        "fc2": init_linear(k2, cfg.intermediate_size, cfg.hidden_size, dtype),
        "norm": init_layer_norm(cfg.hidden_size, dtype),
    }


def init_qformer(key, cfg: QFormerConfig, dtype=jnp.float32) -> Params:
    ke, kl = jax.random.split(key)
    kw, kp = jax.random.split(ke)
    layers = []
    for i in range(cfg.num_layers):
        k1, k2, k3, k4, kl = jax.random.split(kl, 5)
        layer = {
            "self_attn": _init_attn(k1, cfg, cfg.hidden_size, dtype),
            "cross_attn": (
                _init_attn(k2, cfg, cfg.encoder_width, dtype)
                if i % cfg.cross_attention_freq == 0
                else None
            ),
            "ffn": _init_ffn(k3, cfg, dtype),
            "ffn_query": _init_ffn(k4, cfg, dtype),
        }
        layers.append(layer)
    return {
        "embeddings": {
            "word": normal_init(kw, (cfg.vocab_size, cfg.hidden_size), dtype),
            "position": normal_init(kp, (cfg.max_position_embeddings, cfg.hidden_size), dtype),
            "norm": init_layer_norm(cfg.hidden_size, dtype),
        },
        "layers": layers,
    }


def _attn_block(
    cfg: QFormerConfig,
    p: Params,
    x: jnp.ndarray,  # [B, T, H] queries
    kv: jnp.ndarray,  # [B, S, *] keys/values source
    mask: Optional[jnp.ndarray],  # [B, S] bool over keys
) -> jnp.ndarray:
    B, T, _ = x.shape
    S = kv.shape[1]
    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    q = linear(p["q_proj"], x).reshape(B, T, nh, hd)
    k = linear(p["k_proj"], kv).reshape(B, S, nh, hd)
    v = linear(p["v_proj"], kv).reshape(B, S, nh, hd)
    m = mask[:, None, None, :] if mask is not None else None
    a = attention(q, k, v, m).reshape(B, T, cfg.hidden_size)
    a = linear(p["o_proj"], a)
    return layer_norm(p["norm"], a + x, cfg.layer_norm_eps)


def _ffn_block(cfg: QFormerConfig, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.gelu(linear(p["fc1"], x), approximate=False)
    h = linear(p["fc2"], h)
    return layer_norm(p["norm"], h + x, cfg.layer_norm_eps)


def qformer_forward(
    cfg: QFormerConfig,
    params: Params,
    query_embeds: jnp.ndarray,  # [B, Q, H]
    input_ids: Optional[jnp.ndarray],  # [B, L] or None (text_input=False ablation)
    text_mask: Optional[jnp.ndarray],  # [B, L] bool
    encoder_hidden: jnp.ndarray,  # [B, S, E]
    encoder_mask: Optional[jnp.ndarray] = None,  # [B, S] bool
    dtype=jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """Returns hidden states of the query positions [B, Q, H].

    remat=True (training): checkpoint each layer so the backward holds one
    layer's internals at a time instead of all 12 — the compress stage runs
    hundreds of (chunk, frame) rows through this in one batch, and the saved
    per-layer cross-attention K/V and FFN buffers dominate the train step's
    HBM temp at video shapes (PERF.md round 5)."""
    B, Q, _ = query_embeds.shape
    emb = params["embeddings"]
    x = query_embeds.astype(dtype)
    if input_ids is not None:
        L = input_ids.shape[1]
        tok = emb["word"].astype(dtype)[input_ids]
        pos = emb["position"].astype(dtype)[jnp.arange(L)]
        x = jnp.concatenate([x, tok + pos[None]], axis=1)
        attn_key_mask = jnp.concatenate(
            [jnp.ones((B, Q), jnp.bool_), text_mask.astype(jnp.bool_)], axis=1
        )
    else:
        attn_key_mask = jnp.ones((B, Q), jnp.bool_)
    x = layer_norm(emb["norm"], x, cfg.layer_norm_eps)

    def one_layer(layer, x):
        x = _attn_block(cfg, layer["self_attn"], x, x, attn_key_mask)
        q_part, t_part = x[:, :Q], x[:, Q:]
        if layer["cross_attn"] is not None:
            q_part = _attn_block(
                cfg, layer["cross_attn"], q_part, encoder_hidden.astype(dtype), encoder_mask
            )
        q_part = _ffn_block(cfg, layer["ffn_query"], q_part)
        if x.shape[1] > Q:
            t_part = _ffn_block(cfg, layer["ffn"], t_part)
            return jnp.concatenate([q_part, t_part], axis=1)
        return q_part

    if remat:
        one_layer = jax.checkpoint(one_layer)
    for layer in params["layers"]:
        x = one_layer(layer, x)

    return x[:, :Q]
