"""Autoregressive generation: multimodal prefill + jitted decode loop.

Replaces the reference's HF `generate` path (cambrian_qwen.py:399-457, which
stashes vision state on `self` between steps and re-enters Python every
token).  TPU design: vision encode + compression + splice produce a packed
embedding prefix once; `prefill` fills a fixed-capacity KV cache; the decode
loop is a single `lax.while_loop` that compiles once and never leaves the
device until all sequences hit EOS or max_new_tokens.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TDCConfig
from ..model import prepare_multimodal_inputs
from ..models import lm as lm_mod

Params = Any


def greedy_sample(logits: jnp.ndarray, _key) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def temperature_sample(logits: jnp.ndarray, key, temperature: float = 1.0) -> jnp.ndarray:
    return jax.random.categorical(key, logits / temperature, axis=-1).astype(jnp.int32)


def decode_loop(
    cfg: TDCConfig,
    params: Params,
    cache: Dict,
    first_token: jnp.ndarray,  # [B] int32
    max_new_tokens: int,
    temperature: float = 0.0,
    key: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """Runs up to max_new_tokens decode steps; returns tokens [B, max_new_tokens]
    (positions after EOS filled with pad_token_id)."""
    B = first_token.shape[0]
    eos = jnp.asarray(cfg.lm.eos_token_ids, jnp.int32)
    pad = cfg.lm.pad_token_id
    if key is None:
        key = jax.random.PRNGKey(0)

    sample = (
        greedy_sample if temperature == 0.0 else partial(temperature_sample, temperature=temperature)
    )

    def cond(state):
        i, _, _, done, _, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, tok, cache, done, out, key = state
        embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], tok[:, None], cfg.dtype)
        logits, cache = lm_mod.decode_step(
            cfg.lm, params["lm"], embeds, cache, attn_impl=attn_impl, dtype=cfg.dtype
        )
        key, sub = jax.random.split(key)
        nxt = sample(logits, sub)
        nxt = jnp.where(done, pad, nxt)
        out = out.at[:, i].set(nxt)
        done = done | jnp.any(nxt[:, None] == eos[None, :], axis=-1)
        return i + 1, nxt, cache, done, out, key

    # first_token is already the first generated token (from prefill logits)
    out = jnp.full((B, max_new_tokens), pad, jnp.int32)
    out = out.at[:, 0].set(first_token)
    done = jnp.any(first_token[:, None] == eos[None, :], axis=-1)
    state = (jnp.asarray(1), first_token, cache, done, out, key)
    _, _, _, _, out, _ = jax.lax.while_loop(cond, body, state)
    return out


def generate(
    cfg: TDCConfig,
    params: Params,
    input_ids: jnp.ndarray,  # [B, L]
    image_pos: jnp.ndarray,  # [B]
    siglip_px: jnp.ndarray,
    dino_px: jnp.ndarray,
    frame_mask: jnp.ndarray,
    qformer_text_ids: Optional[jnp.ndarray] = None,
    qformer_text_mask: Optional[jnp.ndarray] = None,
    audio_tokens: Optional[jnp.ndarray] = None,
    text_len: Optional[jnp.ndarray] = None,
    token_valid: Optional[jnp.ndarray] = None,
    query_pool: Optional[jnp.ndarray] = None,
    max_new_tokens: int = 64,
    max_len: int = 4096,
    max_visual_len: int = 2048,
    temperature: float = 0.0,
    key: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """End-to-end multimodal generation (the reference main.py:60 round trip).
    Returns generated token ids [B, max_new_tokens]."""
    mm = prepare_multimodal_inputs(
        cfg,
        params,
        input_ids,
        image_pos,
        siglip_px,
        dino_px,
        frame_mask,
        qformer_text_ids,
        qformer_text_mask,
        audio_tokens=audio_tokens,
        text_len=text_len,
        token_valid=token_valid,
        query_pool=query_pool,
        max_len=max_len,
        max_visual_len=max_visual_len,
        attn_impl=attn_impl,
    )
    B = input_ids.shape[0]
    capacity = max_len + max_new_tokens
    cache = lm_mod.init_kv_cache(cfg.lm, B, capacity, dtype=cfg.dtype)
    # Right-pack: embeds are already left-aligned with right padding.
    logits, cache = lm_mod.prefill(
        cfg.lm, params["lm"], mm["embeds"], mm["attn_mask"], cache, attn_impl=attn_impl, dtype=cfg.dtype
    )
    if temperature == 0.0:
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        key = jax.random.PRNGKey(0) if key is None else key
        key, sub = jax.random.split(key)
        first = temperature_sample(logits, sub, temperature)
    return decode_loop(
        cfg,
        params,
        cache,
        first,
        max_new_tokens,
        temperature=temperature,
        key=key,
        attn_impl=attn_impl,
    )


def generate_text_only(
    cfg: TDCConfig,
    params: Params,
    input_ids: jnp.ndarray,  # [B, L] right-padded
    attention_mask: jnp.ndarray,  # [B, L]
    max_new_tokens: int = 64,
    temperature: float = 0.0,
    key: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """Text-only generation (parity harness vs HF and text-only eval rows)."""
    B, L = input_ids.shape
    embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], input_ids, cfg.dtype)
    cache = lm_mod.init_kv_cache(cfg.lm, B, L + max_new_tokens, dtype=cfg.dtype)
    logits, cache = lm_mod.prefill(
        cfg.lm, params["lm"], embeds, attention_mask, cache, attn_impl=attn_impl, dtype=cfg.dtype
    )
    if temperature == 0.0:
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        key = jax.random.PRNGKey(0) if key is None else key
        key, sub = jax.random.split(key)
        first = temperature_sample(logits, sub, temperature)
    return decode_loop(
        cfg, params, cache, first, max_new_tokens, temperature=temperature, key=key, attn_impl=attn_impl
    )


def generate_encoded(
    cfg: TDCConfig,
    params: Params,
    input_ids: jnp.ndarray,  # [B, L]
    image_pos: jnp.ndarray,  # [B]
    frame_feats: jnp.ndarray,  # [B, T, P, H] cached encode_frames output
    dino_feats: jnp.ndarray,  # [B, T, Nd, Cd]
    frame_mask: jnp.ndarray,
    qformer_text_ids: Optional[jnp.ndarray] = None,
    qformer_text_mask: Optional[jnp.ndarray] = None,
    audio_tokens: Optional[jnp.ndarray] = None,
    text_len: Optional[jnp.ndarray] = None,
    token_valid: Optional[jnp.ndarray] = None,
    query_pool: Optional[jnp.ndarray] = None,
    max_new_tokens: int = 64,
    max_len: int = 4096,
    max_visual_len: int = 2048,
    temperature: float = 0.0,
    key: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """Generation over PRE-ENCODED frames: the towers run once per video,
    compression + prefill re-run per question (text-conditioned Q-Former).
    Multi-question benchmarks (Video-MME) and LVCoT re-ask against the cached
    features instead of re-encoding."""
    from ..model import prepare_multimodal_from_features

    mm = prepare_multimodal_from_features(
        cfg,
        params,
        input_ids,
        image_pos,
        frame_feats,
        dino_feats,
        frame_mask,
        qformer_text_ids,
        qformer_text_mask,
        audio_tokens=audio_tokens,
        text_len=text_len,
        token_valid=token_valid,
        query_pool=query_pool,
        max_len=max_len,
        max_visual_len=max_visual_len,
    )
    B = input_ids.shape[0]
    cache = lm_mod.init_kv_cache(cfg.lm, B, max_len + max_new_tokens, dtype=cfg.dtype)
    logits, cache = lm_mod.prefill(
        cfg.lm, params["lm"], mm["embeds"], mm["attn_mask"], cache, attn_impl=attn_impl, dtype=cfg.dtype
    )
    if temperature == 0.0:
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        key = jax.random.PRNGKey(0) if key is None else key
        key, sub = jax.random.split(key)
        first = temperature_sample(logits, sub, temperature)
    return decode_loop(
        cfg, params, cache, first, max_new_tokens,
        temperature=temperature, key=key, attn_impl=attn_impl,
    )
