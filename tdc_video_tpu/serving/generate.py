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


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k largest logits per row, -inf the rest (HF TopKLogitsWarper)."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (HF TopPLogitsWarper): keep the smallest prefix of
    descending-probability tokens whose cumulative mass reaches p (the first
    token crossing the threshold is kept)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep while the mass BEFORE this token is < p (== HF's shift-right rule)
    keep_sorted = (cum - probs) < p
    # threshold = smallest kept logit; ties at the cut are kept, matching the
    # sorted prefix within float equality
    kth = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < kth, -jnp.inf, logits)


def sample_logits(
    logits: jnp.ndarray,
    key,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """HF-generate-equivalent sampling: temperature==0 is greedy; otherwise
    temperature scaling -> top-k -> top-p -> categorical, the warper order of
    the reference demo (`do_sample=True, temperature=0.2` through HF generate,
    /root/reference/main.py:64-65, which applies HF's default top_k=50)."""
    if temperature == 0.0:
        return greedy_sample(logits, key)
    x = logits.astype(jnp.float32) / temperature
    if top_k and top_k > 0:
        x = top_k_filter(x, min(top_k, x.shape[-1]))
    if top_p < 1.0:
        x = top_p_filter(x, top_p)
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)


def filter_rows(
    x: jnp.ndarray,  # [S, V] f32 logits
    temperature: jnp.ndarray,  # [S] f32
    top_k: jnp.ndarray,  # [S] i32; <= 0 disables the filter
    top_p: jnp.ndarray,  # [S] f32; >= 1 disables the filter
) -> jnp.ndarray:
    """Per-row temperature scale -> top-k -> top-p warping (HF order) for a
    batch of independent requests; returns the filtered logits sample_rows
    draws from."""
    V = x.shape[-1]
    xt = x / jnp.maximum(temperature, 1e-6)[:, None]
    # top-k: threshold at the k-th largest logit (ties at the cut survive,
    # matching top_k_filter / HF TopKLogitsWarper); k <= 0 -> keep all
    k = jnp.where(top_k > 0, jnp.minimum(top_k, V), V)
    kth = jnp.take_along_axis(
        jnp.sort(xt, axis=-1)[:, ::-1], (k - 1)[:, None], axis=-1
    )
    xt = jnp.where(xt < kth, -jnp.inf, xt)
    # top-p over the k-filtered distribution (the HF warper order); same
    # shift-right keep rule as top_p_filter, vectorized over per-row p
    s = jnp.sort(xt, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(s, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < jnp.maximum(top_p, 1e-9)[:, None]
    pth = jnp.min(jnp.where(keep, s, jnp.inf), axis=-1, keepdims=True)
    # top_p >= 1 disables the filter EXACTLY (HF skips the TopP warper at
    # 1.0): without this, f32 cumsum can saturate to 1.0 before the tail and
    # -inf genuine tail tokens
    pth = jnp.where(top_p[:, None] >= 1.0, -jnp.inf, pth)
    return jnp.where(xt < pth, -jnp.inf, xt)


def sample_rows(
    logits: jnp.ndarray,  # [S, V]
    temperature: jnp.ndarray,  # [S] f32; <= 0 rows take the plain argmax
    top_k: jnp.ndarray,  # [S] i32; <= 0 disables the filter
    top_p: jnp.ndarray,  # [S] f32; >= 1 disables the filter
    seed: jnp.ndarray,  # [S] i32 per-request sampling seed
    idx: jnp.ndarray,  # [S] i32 per-request token index (0 = first token)
) -> jnp.ndarray:
    """Per-row HF-warper-order sampling (temperature -> top-k -> top-p ->
    categorical) for a batch of independent requests, used by the
    continuous-batching engine (serving/batching.py).

    PRNG is counter-mode: row r draws with key
    fold_in(fold_in(PRNGKey(0), seed[r]), idx[r]), so a request's sampled
    stream is a pure function of (its seed, its token index) — independent of
    which engine slot it lands in and of what else is in the batch.  Rows
    with temperature <= 0 return exactly the greedy chunk's argmax, so mixed
    greedy/sampled batches stay token-identical for the greedy rows."""
    x = logits.astype(jnp.float32)
    greedy = jnp.argmax(x, axis=-1).astype(jnp.int32)
    xt = filter_rows(x, temperature, top_k, top_p)

    def one(row, sd, ix):
        key = jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(0), sd), ix)
        return jax.random.categorical(key, row)

    sampled = jax.vmap(one)(xt, seed, idx).astype(jnp.int32)
    return jnp.where(temperature > 0.0, sampled, greedy)


def decode_loop(
    cfg: TDCConfig,
    params: Params,
    cache: Dict,
    first_token: jnp.ndarray,  # [B] int32
    max_new_tokens: int,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
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

    sample = partial(sample_logits, temperature=temperature, top_k=top_k, top_p=top_p)

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


def _spec_or_plain_decode(
    cfg, params, cache, first, input_ids, prompt_len, max_new_tokens,
    temperature, top_k, top_p, key, attn_impl, spec_window, spec_ngram,
):
    """Route to prompt-lookup speculative decode (greedy only) or the plain
    loop.  Speculation is exact for greedy, so it silently applies whenever
    temperature==0 and spec_window>=2; sampled decode always takes the plain
    loop."""
    if spec_window and spec_window >= 2 and temperature == 0.0:
        from .speculative import pld_decode_loop

        return pld_decode_loop(
            cfg, params, cache, first, input_ids, prompt_len,
            max_new_tokens, window=spec_window, ngram=spec_ngram,
            attn_impl=attn_impl,
        )
    return decode_loop(
        cfg, params, cache, first, max_new_tokens, temperature=temperature,
        top_k=top_k, top_p=top_p, key=key, attn_impl=attn_impl,
    )


def _sample_first(logits, temperature, top_k, top_p, key):
    """First generated token comes from the prefill logits."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), key
    key = jax.random.PRNGKey(0) if key is None else key
    key, sub = jax.random.split(key)
    return sample_logits(logits, sub, temperature, top_k, top_p), key


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
    top_k: int = 50,
    top_p: float = 1.0,
    key: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    kv_quant: Optional[str] = None,  # "int8": halve KV-cache HBM traffic
    act_quant: bool = False,  # int8 MXU prefill (decode stays weight-only)
    spec_window: int = 0,  # >=2: prompt-lookup speculative decode (greedy)
    spec_ngram: int = 3,
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
    # spec headroom: verify_step writes a whole window before acceptance
    capacity = max_len + max_new_tokens + max(spec_window - 1, 0)
    cache = lm_mod.init_kv_cache(cfg.lm, B, capacity, dtype=cfg.dtype, quant=kv_quant)
    # Right-pack: embeds are already left-aligned with right padding.
    logits, cache = lm_mod.prefill(
        cfg.lm, params["lm"], mm["embeds"], mm["attn_mask"], cache, attn_impl=attn_impl, dtype=cfg.dtype, act_quant=act_quant
    )
    first, key = _sample_first(logits, temperature, top_k, top_p, key)
    # Prompt-lookup drafts come from the TEXT ids (the expanded visual tokens
    # have no token identity); a pad-including prompt_len only weakens drafts.
    prompt_len = (
        text_len if text_len is not None
        else jnp.full((B,), input_ids.shape[1], jnp.int32)
    )
    return _spec_or_plain_decode(
        cfg, params, cache, first, input_ids, prompt_len, max_new_tokens,
        temperature, top_k, top_p, key, attn_impl, spec_window, spec_ngram,
    )


def generate_text_only(
    cfg: TDCConfig,
    params: Params,
    input_ids: jnp.ndarray,  # [B, L] right-padded
    attention_mask: jnp.ndarray,  # [B, L]
    max_new_tokens: int = 64,
    temperature: float = 0.0,
    top_k: int = 50,
    top_p: float = 1.0,
    key: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    kv_quant: Optional[str] = None,  # "int8": halve KV-cache HBM traffic
    act_quant: bool = False,  # int8 MXU prefill (decode stays weight-only)
    spec_window: int = 0,  # >=2: prompt-lookup speculative decode (greedy)
    spec_ngram: int = 3,
) -> jnp.ndarray:
    """Text-only generation (parity harness vs HF and text-only eval rows)."""
    B, L = input_ids.shape
    embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], input_ids, cfg.dtype)
    capacity = L + max_new_tokens + max(spec_window - 1, 0)
    cache = lm_mod.init_kv_cache(cfg.lm, B, capacity, dtype=cfg.dtype, quant=kv_quant)
    logits, cache = lm_mod.prefill(
        cfg.lm, params["lm"], embeds, attention_mask, cache, attn_impl=attn_impl, dtype=cfg.dtype, act_quant=act_quant
    )
    first, key = _sample_first(logits, temperature, top_k, top_p, key)
    prompt_len = attention_mask.astype(jnp.int32).sum(-1)
    return _spec_or_plain_decode(
        cfg, params, cache, first, input_ids, prompt_len, max_new_tokens,
        temperature, top_k, top_p, key, attn_impl, spec_window, spec_ngram,
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
    top_k: int = 50,
    top_p: float = 1.0,
    key: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    kv_quant: Optional[str] = None,  # "int8": halve KV-cache HBM traffic
    act_quant: bool = False,  # int8 MXU prefill (decode stays weight-only)
    spec_window: int = 0,  # >=2: prompt-lookup speculative decode (greedy)
    spec_ngram: int = 3,
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
    capacity = max_len + max_new_tokens + max(spec_window - 1, 0)
    cache = lm_mod.init_kv_cache(cfg.lm, B, capacity, dtype=cfg.dtype, quant=kv_quant)
    logits, cache = lm_mod.prefill(
        cfg.lm, params["lm"], mm["embeds"], mm["attn_mask"], cache, attn_impl=attn_impl, dtype=cfg.dtype, act_quant=act_quant
    )
    first, key = _sample_first(logits, temperature, top_k, top_p, key)
    prompt_len = (
        text_len if text_len is not None
        else jnp.full((B,), input_ids.shape[1], jnp.int32)
    )
    return _spec_or_plain_decode(
        cfg, params, cache, first, input_ids, prompt_len, max_new_tokens,
        temperature, top_k, top_p, key, attn_impl, spec_window, spec_ngram,
    )
