"""Decoder-only language model core (Qwen2 / Llama-3.x).

One GQA + SwiGLU + RMSNorm decoder serves both reference LLM wrappers
(tdc/language_model/cambrian_qwen.py and cambrian_llama.py) — they differ only
in hyperparameters (see config.LMConfig).  TPU-first design choices:

* layers are stacked on a leading axis and iterated with `lax.scan`, so the
  28-layer 7B model compiles as one layer body (fast compiles, XLA-friendly);
* the KV cache is a fixed-capacity buffer with explicit validity mask and
  per-sample lengths — static shapes, no recompiles as generation proceeds;
* attention dispatches to a Pallas flash kernel for long prefill, XLA einsum
  otherwise (ops/flash_attention.py);
* all reductions are f32, matmuls bf16 on the MXU.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LMConfig
from .attention import attention
from .layers import (
    apply_rope,
    init_linear,
    init_rms_norm,
    init_swiglu_mlp,
    linear,
    normal_init,
    rms_norm,
    rope_cos_sin,
    rope_inv_freq,
    swiglu_mlp,
)

Params = Any


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_layer(key, cfg: LMConfig, dtype):
    ks = jax.random.split(key, 8)
    bias = cfg.attention_bias
    return {
        "input_norm": init_rms_norm(cfg.hidden_size, dtype),
        "q_proj": init_linear(ks[0], cfg.hidden_size, cfg.q_dim, dtype, bias=bias),
        "k_proj": init_linear(ks[1], cfg.hidden_size, cfg.kv_dim, dtype, bias=bias),
        "v_proj": init_linear(ks[2], cfg.hidden_size, cfg.kv_dim, dtype, bias=bias),
        "o_proj": init_linear(ks[3], cfg.q_dim, cfg.hidden_size, dtype, bias=False),
        "post_attn_norm": init_rms_norm(cfg.hidden_size, dtype),
        "mlp": init_swiglu_mlp(ks[4], cfg.hidden_size, cfg.intermediate_size, dtype),
    }


def init_lm(key, cfg: LMConfig, dtype=jnp.float32) -> Params:
    k_embed, k_layers, k_head = jax.random.split(key, 3)
    layer_keys = jax.random.split(k_layers, cfg.num_layers)
    # Stack per-layer params along axis 0 for lax.scan.
    layers = jax.vmap(lambda k: _init_layer(k, cfg, dtype))(layer_keys)
    params = {
        "embed": {"embedding": normal_init(k_embed, (cfg.vocab_size, cfg.hidden_size), dtype)},
        "layers": layers,
        "final_norm": init_rms_norm(cfg.hidden_size, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = init_linear(k_head, cfg.hidden_size, cfg.vocab_size, dtype, bias=False)
    return params


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(
    cfg: LMConfig, batch: int, capacity: int, dtype=jnp.bfloat16,
    quant: Optional[str] = None,
) -> Dict:
    """Fixed-capacity KV cache.  quant="int8" stores K/V as int8 with
    per-token-per-head scales: decode streams the whole cache every token, so
    halving its bytes halves the HBM traffic that bounds decode at long
    context (PERF.md: 7B int8 decode sits at ~90% of the bf16-KV roofline).
    Quantization happens at write (decode/prefill scatter); the dequant
    multiply fuses into the attention read.  Replaces the bf16 HF cache of
    the reference decode loop (tdc/language_model/cambrian_qwen.py:150-184)."""
    shape = (cfg.num_layers, batch, capacity, cfg.num_kv_heads, cfg.head_dim)
    if quant == "int8":
        sshape = shape[:-1]
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v_scale": jnp.zeros(sshape, jnp.float32),
            "mask": jnp.zeros((batch, capacity), jnp.bool_),
            "lengths": jnp.zeros((batch,), jnp.int32),
        }
    if quant not in (None, "none"):
        raise ValueError(f"unknown kv quant mode {quant!r}")
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "mask": jnp.zeros((batch, capacity), jnp.bool_),  # True = valid key slot
        "lengths": jnp.zeros((batch,), jnp.int32),
    }


def _quant_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., D] -> (int8 [..., D], f32 scale [...]): symmetric per-vector."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_forward(
    cfg: LMConfig,
    p: Params,
    x: jnp.ndarray,  # [B, T, H]
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray],  # [B, 1, T, S] bool
    cache_k: Optional[jnp.ndarray],  # [B, S, Hkv, D]
    cache_v: Optional[jnp.ndarray],
    write_pos: Optional[jnp.ndarray],  # [B, T] slot indices to write new k/v
    attn_impl: str,
    causal: bool = False,
    act_quant: bool = False,
    verify: bool = False,
):
    B, T, _ = x.shape
    h = rms_norm(p["input_norm"], x, cfg.rms_norm_eps)
    if act_quant and "w_q" in p["q_proj"]:
        # int8 MXU prefill (models/quant.py): one shared activation
        # quantization feeds q/k/v; ~1.56x weight-only prefill (PERF.md)
        from .layers import int8_dot, int8_qact

        hq, hs = int8_qact(h)

        def _proj(pp):
            y = int8_dot(hq, hs, pp, x.dtype)
            return y
        q = _proj(p["q_proj"]).reshape(B, T, cfg.num_heads, cfg.head_dim)
        k = _proj(p["k_proj"]).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        v = _proj(p["v_proj"]).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    else:
        q = linear(p["q_proj"], h).reshape(B, T, cfg.num_heads, cfg.head_dim)
        k = linear(p["k_proj"], h).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        v = linear(p["v_proj"], h).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache_k is not None and isinstance(cache_k, tuple):
        # int8 cache: (values int8, scales f32).  Quantize at write; NEVER
        # materialize a dequantized cache (that would write+read a full bf16
        # cache per step and lose to bf16 KV — measured, see sdpa_int8kv).
        b_idx = jnp.arange(B)[:, None]
        ck, ks = cache_k
        cv, vs = cache_v
        kq, ksc = _quant_kv(k)
        vq, vsc = _quant_kv(v)
        ck = ck.at[b_idx, write_pos].set(kq)
        ks = ks.at[b_idx, write_pos].set(ksc)
        cv = cv.at[b_idx, write_pos].set(vq)
        vs = vs.at[b_idx, write_pos].set(vsc)
        cache_k, cache_v = (ck, ks), (cv, vs)
        if T > 1 and not verify:
            # single-shot prefill: the cache holds exactly the fresh keys, so
            # attend over the pre-quantization bf16 k/v (more accurate, and
            # keeps the flash path); mask columns beyond T are sliced off.
            m = None if attn_mask is None else attn_mask[..., :T]
            attn = attention(q, k, v, m, impl=attn_impl, causal=causal)
        else:
            # decode (T=1) or speculative verify (T=K>1 over a NON-empty
            # cache): attend over the full quantized cache — the window's
            # fresh keys were just written above, so this reads them back
            # quantized, exactly like sequential decode steps would.
            from .layers import sdpa_int8kv

            attn = sdpa_int8kv(q, ck, ks, cv, vs, attn_mask)
    else:
        if cache_k is not None:
            # Scatter new keys/values into the cache at per-sample positions.
            b_idx = jnp.arange(B)[:, None]
            cache_k = cache_k.at[b_idx, write_pos].set(k.astype(cache_k.dtype))
            cache_v = cache_v.at[b_idx, write_pos].set(v.astype(cache_v.dtype))
            k_all, v_all = cache_k, cache_v
        else:
            k_all, v_all = k, v

        attn = attention(
            q, k_all.astype(q.dtype), v_all.astype(q.dtype), attn_mask, impl=attn_impl, causal=causal
        )
    attn = attn.reshape(B, T, cfg.q_dim)
    x = x + linear(p["o_proj"], attn, act_quant=act_quant)

    h2 = rms_norm(p["post_attn_norm"], x, cfg.rms_norm_eps)
    x = x + swiglu_mlp(p["mlp"], h2, act_quant=act_quant)
    return x, cache_k, cache_v


def lm_backbone(
    cfg: LMConfig,
    params: Params,
    inputs_embeds: jnp.ndarray,  # [B, T, H]
    positions: jnp.ndarray,  # [B, T]
    attn_mask: Optional[jnp.ndarray] = None,  # [B, 1, T, S] bool
    cache: Optional[Dict] = None,
    write_pos: Optional[jnp.ndarray] = None,  # [B, T]
    attn_impl: str = "xla",
    remat: bool = False,
    dtype=jnp.bfloat16,
    causal: bool = False,
    act_quant: bool = False,
    verify: bool = False,
) -> Tuple[jnp.ndarray, Optional[Dict]]:
    """Run the decoder stack; returns (final hidden [B,T,H], updated cache).
    `causal=True` certifies the mask is causal over right-padded rows, which
    unlocks the Pallas flash path.  `verify=True` marks a multi-token step
    over a non-empty cache (speculative decoding), which must read the whole
    cache rather than treat T>1 as single-shot prefill."""
    x = inputs_embeds.astype(dtype)
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq)

    layer_fn = functools.partial(
        _layer_forward, cfg, attn_impl=attn_impl, causal=causal,
        act_quant=act_quant, verify=verify,
    )
    if remat:
        layer_fn = jax.checkpoint(layer_fn, static_argnums=())

    if cache is not None and "k_scale" in cache:  # int8 KV cache

        def body(carry, scanned):
            h = carry
            lp, ck, cv, ks, vs = scanned
            h, (ck, ks), (cv, vs) = layer_fn(
                lp, h, cos, sin, attn_mask, (ck, ks), (cv, vs), write_pos
            )
            return h, (ck, cv, ks, vs)

        x, (nk, nv, nks, nvs) = jax.lax.scan(
            body,
            x,
            (params["layers"], cache["k"], cache["v"], cache["k_scale"], cache["v_scale"]),
        )
        cache = dict(cache, k=nk, v=nv, k_scale=nks, v_scale=nvs)
    elif cache is not None:

        def body(carry, scanned):
            h = carry
            lp, ck, cv = scanned
            h, ck, cv = layer_fn(lp, h, cos, sin, attn_mask, ck, cv, write_pos)
            return h, (ck, cv)

        x, (new_k, new_v) = jax.lax.scan(body, x, (params["layers"], cache["k"], cache["v"]))
        cache = dict(cache, k=new_k, v=new_v)
    else:

        def body(carry, lp):
            h = carry
            h, _, _ = layer_fn(lp, h, cos, sin, attn_mask, None, None, None)
            return h, None

        x, _ = jax.lax.scan(body, x, params["layers"])

    x = rms_norm(params["final_norm"], x, cfg.rms_norm_eps)
    return x, cache


def embed_tokens(cfg: LMConfig, params: Params, input_ids: jnp.ndarray, dtype=jnp.bfloat16):
    ids = jnp.clip(input_ids, 0, cfg.vocab_size - 1)  # guard sentinel ids (<image>=-200)
    return params["embed"]["embedding"].astype(dtype)[ids]


def lm_head(cfg: LMConfig, params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    if cfg.tie_word_embeddings:
        w = params["embed"]["embedding"].astype(hidden.dtype)
        return jnp.einsum("bth,vh->btv", hidden, w, preferred_element_type=jnp.float32)
    p = params["lm_head"]
    if "w_q" in p:  # weight-only int8 (models/quant.py)
        y = jnp.einsum(
            "bth,hv->btv", hidden, p["w_q"].astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        )
        return y * p["w_scale"][None, None, :]
    return jnp.einsum(
        "bth,hv->btv",
        hidden,
        p["w"].astype(hidden.dtype),
        preferred_element_type=jnp.float32,
    )


def lm_forward(
    cfg: LMConfig,
    params: Params,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,  # [B, T] bool, True = valid
    positions: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    remat: bool = False,
    dtype=jnp.bfloat16,
    seq_axis: Optional[str] = None,
    act_quant: bool = False,
    return_hidden: bool = False,
) -> jnp.ndarray:
    """Full-sequence causal forward (training / scoring).  Returns f32 logits
    (or the final hidden states when return_hidden — the chunked-CE path in
    lm_loss applies the head itself).

    seq_axis: mesh axis name to shard the SEQUENCE dim over (sequence
    parallelism for long prefill — a capability the reference lacks,
    SURVEY.md section 5 "long-context").  GSPMD keeps activations/MLP sharded
    on T and inserts the K/V all-gathers attention needs on ICI.
    """
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(cfg, params, input_ids, dtype)
    if seq_axis is not None:
        from jax.sharding import PartitionSpec as _P

        inputs_embeds = jax.lax.with_sharding_constraint(
            inputs_embeds, _P(None, seq_axis, None)
        )
    B, T, _ = inputs_embeds.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, T), jnp.bool_)
    if positions is None:
        positions = jnp.maximum(jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)
    causal = jnp.tril(jnp.ones((T, T), jnp.bool_))
    mask = causal[None, None] & attention_mask[:, None, None, :]
    hidden, _ = lm_backbone(
        cfg,
        params,
        inputs_embeds,
        positions,
        mask,
        attn_impl=attn_impl,
        remat=remat,
        dtype=dtype,
        causal=True,
        act_quant=act_quant,
    )
    if return_hidden:
        return hidden
    return lm_head(cfg, params, hidden)


def lm_loss(
    cfg: LMConfig,
    params: Params,
    inputs_embeds: jnp.ndarray,
    labels: jnp.ndarray,  # [B, T], IGNORE_INDEX = ignored
    attention_mask: jnp.ndarray,
    positions: Optional[jnp.ndarray] = None,
    attn_impl: str = "xla",
    remat: bool = True,
    dtype=jnp.bfloat16,
    loss_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Shifted cross-entropy over valid label positions (reference CE at
    cambrian_qwen.py:374-385).

    loss_chunk: compute the CE in lax.scan chunks of this many positions,
    rematerializing each chunk's [B, C, V] logits in the backward pass
    instead of holding the full [B, T, V] f32 logits + log-softmax (+
    cotangents) live.  At 8k tokens over a 128k vocab the unchunked form
    costs ~4.2 GB per buffer — the single largest activation in long-context
    training and what kept stage-3 at 8k off one v5e chip; chunked at 512 it
    peaks at ~0.26 GB.  Numerically identical ops per position (f32
    log-softmax, f32 accumulate), so parity with the unchunked path is exact
    up to sum order (tests/test_lm.py::test_chunked_loss_matches)."""
    targets = labels[:, 1:]
    valid = targets >= 0
    safe_targets = jnp.clip(jnp.where(valid, targets, 0), 0, cfg.vocab_size - 1)
    denom = jnp.maximum(valid.sum(), 1)

    if loss_chunk is None:
        logits = lm_forward(
            cfg,
            params,
            inputs_embeds=inputs_embeds,
            attention_mask=attention_mask,
            positions=positions,
            attn_impl=attn_impl,
            remat=remat,
            dtype=dtype,
        )
        logits = logits[:, :-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_ll = jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
        return -(tok_ll * valid).sum() / denom

    hidden = lm_forward(
        cfg,
        params,
        inputs_embeds=inputs_embeds,
        attention_mask=attention_mask,
        positions=positions,
        attn_impl=attn_impl,
        remat=remat,
        dtype=dtype,
        return_hidden=True,
    )
    B, T, H = hidden.shape
    C = int(loss_chunk)
    n = -(-(T - 1) // C)  # chunks over the T-1 predicting positions
    pad = n * C - (T - 1)
    h = jnp.pad(hidden[:, :-1], ((0, 0), (0, pad), (0, 0)))
    t = jnp.pad(safe_targets, ((0, 0), (0, pad)))
    v = jnp.pad(valid, ((0, 0), (0, pad)))
    # scan over [n, B, C, ...] chunk-major slices; the chunk body is
    # checkpointed so backward recomputes its logits instead of storing them
    h = h.reshape(B, n, C, H).swapaxes(0, 1)
    t = t.reshape(B, n, C).swapaxes(0, 1)
    v = v.reshape(B, n, C).swapaxes(0, 1)

    @jax.checkpoint
    def chunk_ll(h_c, t_c, v_c):
        logits = lm_head(cfg, params, h_c)  # [B, C, V] f32
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, t_c[..., None], axis=-1)[..., 0]
        return (ll * v_c).sum()

    def body(acc, xs):
        h_c, t_c, v_c = xs
        return acc + chunk_ll(h_c, t_c, v_c), None

    total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (h, t, v))
    return -total / denom


# ---------------------------------------------------------------------------
# Prefill / decode steps (used by serving/generate.py)
# ---------------------------------------------------------------------------


def prefill(
    cfg: LMConfig,
    params: Params,
    inputs_embeds: jnp.ndarray,  # [B, T, H] right-padded
    attention_mask: jnp.ndarray,  # [B, T] bool
    cache: Dict,
    attn_impl: str = "xla",
    dtype=jnp.bfloat16,
    act_quant: bool = False,
) -> Tuple[jnp.ndarray, Dict]:
    """Prefill the cache; returns (last-token logits [B, V], cache).
    act_quant=True runs the projections as s8 x s8 MXU dots with per-token
    activation scales (~1.56x weight-only int8 prefill, PERF.md); decode
    steps stay weight-only (bandwidth-bound)."""
    B, T, _ = inputs_embeds.shape
    S = cache["k"].shape[2]
    positions = jnp.maximum(jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)
    write_pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    qi = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    causal = (kj <= qi)[None, None]  # cache slots line up with query positions
    mask = causal & attention_mask[:, None, None, :].astype(jnp.bool_) if T == S else None
    if T != S:
        key_valid = jnp.zeros((B, S), jnp.bool_).at[:, :T].set(attention_mask)
        mask = causal & key_valid[:, None, None, :]
    hidden, cache = lm_backbone(
        cfg,
        params,
        inputs_embeds,
        positions,
        mask,
        cache=cache,
        write_pos=write_pos,
        attn_impl=attn_impl,
        dtype=dtype,
        causal=True,
        act_quant=act_quant,
    )
    lengths = attention_mask.astype(jnp.int32).sum(-1)
    cache["mask"] = cache["mask"].at[:, :T].set(attention_mask)
    cache["lengths"] = lengths
    last = jnp.take_along_axis(hidden, (lengths - 1)[:, None, None], axis=1)  # [B,1,H]
    return lm_head(cfg, params, last)[:, 0], cache


def decode_step(
    cfg: LMConfig,
    params: Params,
    token_embeds: jnp.ndarray,  # [B, 1, H]
    cache: Dict,
    attn_impl: str = "xla",
    dtype=jnp.bfloat16,
    active: Optional[jnp.ndarray] = None,  # [B] bool; inactive slots frozen
) -> Tuple[jnp.ndarray, Dict]:
    """One autoregressive step; writes at per-sample `lengths`, returns logits [B, V].

    `active` enables continuous batching (serving/batching.py): inactive
    slots still flow through the batched matmuls (their K/V write lands on
    the slot's next unused, still-masked cache position — harmless), but
    their attention mask and lengths are left untouched, so a slot can sit
    idle or be re-admitted mid-loop without a separate compile."""
    B = token_embeds.shape[0]
    S = cache["k"].shape[2]
    lengths = cache["lengths"]
    positions = lengths[:, None]
    write_pos = jnp.minimum(lengths, S - 1)[:, None]
    step_mask = cache["mask"].at[jnp.arange(B), jnp.minimum(lengths, S - 1)].set(True)
    attn_mask = step_mask[:, None, None, :]  # [B,1,1,S]
    hidden, cache = lm_backbone(
        cfg,
        params,
        token_embeds,
        positions,
        attn_mask,
        cache=cache,
        write_pos=write_pos,
        attn_impl=attn_impl,
        dtype=dtype,
    )
    if active is None:
        cache["mask"] = step_mask
        cache["lengths"] = lengths + 1
    else:
        cache["mask"] = jnp.where(active[:, None], step_mask, cache["mask"])
        cache["lengths"] = lengths + active.astype(lengths.dtype)
    return lm_head(cfg, params, hidden)[:, 0], cache


def verify_step(
    cfg: LMConfig,
    params: Params,
    token_embeds: jnp.ndarray,  # [B, K, H] — last accepted token + K-1 drafts
    cache: Dict,
    attn_impl: str = "xla",
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Dict]:
    """K-token step for speculative decoding (serving/speculative.py).

    Processes K tokens at the per-sample cache tails in ONE forward pass —
    decode is HBM-bandwidth-bound on the weight stream, so the K-token dot
    costs nearly the same as decode_step's 1-token dot; that near-free slack
    is what makes draft verification profitable on TPU.  Window token j
    attends every valid cache slot plus window slots 0..j (its own causal
    prefix).  K/V are written at slots lengths..lengths+K-1 but mask/lengths
    are NOT advanced: the caller commits exactly the accepted prefix with
    `commit_verified`, and rejected slots are plain garbage above `lengths`
    that the next window overwrites.  Requires lengths + K <= capacity
    (callers allocate `window` slots of headroom; a clamped tail write would
    corrupt an already-committed slot).  Returns (logits [B, K, V], cache).
    """
    hidden, cache = _window_forward(
        cfg, params, token_embeds, cache, attn_impl=attn_impl, dtype=dtype
    )
    return lm_head(cfg, params, hidden), cache


def _window_forward(cfg, params, token_embeds, cache, attn_impl, dtype):
    """Shared body of verify_step/extend_prefill: forward a K-token window
    sitting at the per-sample cache tails (window token j at absolute
    position lengths+j, attending committed cache + its causal window);
    K/V written above lengths but NOT committed.  Returns (hidden, cache)."""
    B, K, _ = token_embeds.shape
    S = cache["k"].shape[2]
    lengths = cache["lengths"]
    offs = jnp.arange(K)[None]  # [1, K]
    positions = lengths[:, None] + offs
    write_pos = jnp.minimum(positions, S - 1)
    col = jnp.arange(S)[None, None]  # [1, 1, S]
    window = (col >= lengths[:, None, None]) & (
        col <= lengths[:, None, None] + offs[..., None]
    )  # [B, K, S]
    attn_mask = (cache["mask"][:, None, :] | window)[:, None]  # [B,1,K,S]
    return lm_backbone(
        cfg,
        params,
        token_embeds,
        positions,
        attn_mask,
        cache=cache,
        write_pos=write_pos,
        attn_impl=attn_impl,
        dtype=dtype,
        verify=True,
    )


def commit_verified(cache: Dict, accept: jnp.ndarray) -> Dict:
    """Advance the cache past `accept` [B] verified window tokens: their K/V
    were already written by verify_step; this flips their mask slots valid
    and bumps lengths.  accept=0 leaves the sample untouched."""
    S = cache["k"].shape[2]
    col = jnp.arange(S)[None]
    lengths = cache["lengths"]
    new = (col >= lengths[:, None]) & (col < (lengths + accept)[:, None])
    return dict(
        cache,
        mask=cache["mask"] | new,
        lengths=lengths + accept.astype(lengths.dtype),
    )


def extend_prefill(
    cfg: LMConfig,
    params: Params,
    token_embeds: jnp.ndarray,  # [B, K, H] right-padded suffix
    n_valid: jnp.ndarray,  # [B] true suffix lengths (<= K)
    cache: Dict,
    attn_impl: str = "xla",
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Dict]:
    """Continue a prefill from the cache tail: process a (padded) K-token
    suffix in one forward over an already-prefilled cache and commit exactly
    `n_valid` tokens.  Same mask/position math as `verify_step` — suffix
    token j sits at absolute position lengths+j and attends the committed
    cache plus its own causal window — so the committed K/V and the returned
    next-token logits are identical to prefilling prefix+suffix in one shot.

    This is what makes shared-prefix serving cheap (serving/batching.py
    prefix_key): a multi-question video prompt shares everything up to the
    question text, so the ~3.6k-token video prefix prefills ONCE and each
    question pays only its own ~100-token suffix.  The reference re-runs the
    full prompt per question (tdc/language_model/cambrian_qwen.py:441-457).
    Requires lengths + K <= capacity.  Returns (logits [B, V] at the last
    valid suffix token, committed cache)."""
    hidden, cache = _window_forward(
        cfg, params, token_embeds, cache, attn_impl=attn_impl, dtype=dtype
    )
    idx = jnp.maximum(n_valid - 1, 0)[:, None, None]  # [B,1,1]
    last = jnp.take_along_axis(hidden, idx, axis=1)  # [B,1,H]
    return lm_head(cfg, params, last)[:, 0], commit_verified(cache, n_valid)
