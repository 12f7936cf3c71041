"""BEATs audio encoder in JAX.

Re-implements the behavior of the reference's vendored BEATs
(tdc/audio_models/beats/{BEATs,backbone}.py — a fairseq-style ViT over
128-bin kaldi fbanks): 16x16 patch conv -> 512-d -> LayerNorm ->
post_extract_proj to 768 -> 12-layer post-LN transformer with

* grouped-conv positional embedding (kernel 128, 16 groups, SamePad + GELU,
  backbone.py:32-46);
* T5-style bucketed relative position bias, computed once and shared across
  layers (backbone.py:79-82, 419-430);
* gated relative position ("grep") modulation of the bias per query
  (backbone.py:651-658);
* deep-norm residual scaling alpha=(2*12)^(1/4) (backbone.py:208-212,254-276).

TPU-first notes: layers are stacked and scanned; the rel-pos bias is a static
[T, T] gather (one embedding lookup per compile shape); attention logits keep
the reference's max-subtraction + alpha=32 rescaling trick (backbone.py:623-624,
513-515) so converted fp16 checkpoints stay in-range in bf16.  All dropout is
identity (the towers are frozen in every reference training stage).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import BeatsConfig
from .layers import init_layer_norm, init_linear, layer_norm, linear, normal_init

Params = Any

ATTN_ALPHA = 32.0


def _init_layer(key, cfg: BeatsConfig, dtype):
    ks = jax.random.split(key, 8)
    d, f = cfg.encoder_embed_dim, cfg.ffn_dim
    nh = cfg.num_heads
    hd = d // nh
    return {
        "q_proj": init_linear(ks[0], d, d, dtype),
        "k_proj": init_linear(ks[1], d, d, dtype),
        "v_proj": init_linear(ks[2], d, d, dtype),
        "o_proj": init_linear(ks[3], d, d, dtype),
        "attn_norm": init_layer_norm(d, dtype),
        "fc1": init_linear(ks[4], d, f, dtype),
        "fc2": init_linear(ks[5], f, d, dtype),
        "final_norm": init_layer_norm(d, dtype),
        # gated relative position parameters (backbone.py:364-366)
        "grep_linear": init_linear(ks[6], hd, 8, dtype),
        "grep_a": jnp.ones((nh,), dtype),
    }


def init_beats(key, cfg: BeatsConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    patch_dim = cfg.patch_size * cfg.patch_size
    layers = jax.vmap(lambda k: _init_layer(k, cfg, dtype))(
        jax.random.split(ks[0], cfg.num_layers)
    )
    params = {
        "patch_embed": {"w": normal_init(ks[1], (patch_dim, cfg.embed_dim), dtype)},
        "patch_norm": init_layer_norm(cfg.embed_dim, dtype),
        "post_extract_proj": init_linear(ks[2], cfg.embed_dim, cfg.encoder_embed_dim, dtype),
        # pos_conv: grouped Conv1d weight [out=768, in/groups=48, k=128] + bias
        "pos_conv": {
            "w": normal_init(
                ks[3],
                (cfg.encoder_embed_dim, cfg.encoder_embed_dim // 16, 128),
                dtype,
                stddev=math.sqrt(4.0 / (128 * cfg.encoder_embed_dim)),
            ),
            "b": jnp.zeros((cfg.encoder_embed_dim,), dtype),
        },
        "encoder_norm": init_layer_norm(cfg.encoder_embed_dim, dtype),
        "rel_pos_bias": normal_init(ks[4], (cfg.num_buckets, cfg.num_heads), dtype),
        "layers": layers,
    }
    if cfg.conv_bias:
        params["patch_embed"]["b"] = jnp.zeros((cfg.embed_dim,), dtype)
    return params


# ---------------------------------------------------------------------------
# Relative position buckets (backbone.py:392-430)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def relative_position_buckets(T: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """[T, T] int32 bucket indices, bidirectional T5 bucketing."""
    ctx = np.arange(T)[:, None]
    mem = np.arange(T)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets.astype(np.int32)


def compute_position_bias(params: Params, cfg: BeatsConfig, T: int) -> jnp.ndarray:
    """[num_heads, T, T] f32 (backbone.py:419-430), shared across layers."""
    buckets = jnp.asarray(relative_position_buckets(T, cfg.num_buckets, cfg.max_distance))
    values = params["rel_pos_bias"].astype(jnp.float32)[buckets]  # [T, T, H]
    return values.transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def patch_embed(cfg: BeatsConfig, params: Params, fbank: jnp.ndarray) -> jnp.ndarray:
    """[B, F, 128] normalized fbank -> [B, (F//16)*8, embed_dim].

    The 16x16 stride-16 Conv2d (BEATs.py:90) becomes one patch matmul; token
    order matches torch's reshape(B, C, -1).transpose(1, 2): time-major over
    the (F//16, 8) grid.
    """
    B, F, M = fbank.shape
    p = cfg.patch_size
    gt, gf = F // p, M // p
    x = fbank[:, : gt * p].reshape(B, gt, p, gf, p)
    x = x.transpose(0, 1, 3, 2, 4).reshape(B, gt * gf, p * p)
    out = x @ params["patch_embed"]["w"].astype(x.dtype)
    if "b" in params["patch_embed"]:
        out = out + params["patch_embed"]["b"].astype(x.dtype)
    return out


def _pos_conv(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Grouped Conv1d positional embedding, SamePad(128) + GELU
    (backbone.py:32-46,113-116)."""
    w = params["pos_conv"]["w"].astype(x.dtype)  # [O, I/G, K]
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(64, 64)],
        dimension_numbers=("NTC", "OIT", "NTC"),
        feature_group_count=16,
    )
    out = out[:, :-1] + params["pos_conv"]["b"].astype(x.dtype)  # SamePad: even kernel
    return jax.nn.gelu(out, approximate=False)


def _layer_forward(
    cfg: BeatsConfig,
    p: Params,
    x: jnp.ndarray,  # [B, T, D]
    pos_bias: jnp.ndarray,  # [H, T, T] f32
    key_mask: Optional[jnp.ndarray],  # [B, T] bool, True = valid
    alpha: float,
) -> jnp.ndarray:
    B, T, D = x.shape
    nh = cfg.num_heads
    hd = D // nh

    q = linear(p["q_proj"], x).reshape(B, T, nh, hd)
    k = linear(p["k_proj"], x).reshape(B, T, nh, hd)
    v = linear(p["v_proj"], x).reshape(B, T, nh, hd)

    scale = hd**-0.5 / ATTN_ALPHA
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    logits = (logits - logits.max(axis=-1, keepdims=True)) * ATTN_ALPHA
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, -1e30)

    if cfg.gru_rel_pos:
        # Gated rel-pos (backbone.py:651-658): gates derive from the unscaled q.
        g = linear(p["grep_linear"], q.astype(jnp.float32)).reshape(B, T, nh, 2, 4).sum(-1)
        gate = jax.nn.sigmoid(g)  # [B, T, H, 2]
        gate_a, gate_b = gate[..., 0], gate[..., 1]
        gate_a_1 = gate_a * (gate_b * p["grep_a"].astype(jnp.float32)[None, None] - 1.0) + 2.0
        bias = gate_a_1.transpose(0, 2, 1)[..., None] * pos_bias[None]  # [B, H, T, T]
    else:
        bias = pos_bias[None]
    logits = logits + bias

    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
    attn = linear(p["o_proj"], attn)

    x = layer_norm(p["attn_norm"], x * alpha + attn, 1e-5)
    h = jax.nn.gelu(linear(p["fc1"], x), approximate=False)
    h = linear(p["fc2"], h)
    return layer_norm(p["final_norm"], x * alpha + h, 1e-5)


def beats_forward(
    cfg: BeatsConfig,
    params: Params,
    fbank: jnp.ndarray,  # [B, F, 128] raw log-mel (normalization applied here)
    fbank_mask: Optional[jnp.ndarray] = None,  # [B, F] bool, True = valid
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (features [B, T, encoder_embed_dim], token_mask [B, T] or None).

    Mirrors BEATs.extract_features(feature_only=True) (BEATs.py:131-177):
    fbank normalize -> patch conv -> LN -> proj -> pos conv -> post-LN encoder.
    """
    from ..ops.audio import normalize_fbank

    x = normalize_fbank(fbank.astype(jnp.float32), cfg.fbank_mean, cfg.fbank_std)
    x = patch_embed(cfg, params, x.astype(dtype))
    x = layer_norm(params["patch_norm"], x, 1e-5)
    x = linear(params["post_extract_proj"], x)
    B, T, D = x.shape

    token_mask = None
    if fbank_mask is not None:
        # forward_padding_mask (BEATs.py:103-114): a patch-row is padding only
        # if every covered fbank frame is padding.
        p = cfg.patch_size
        gt = fbank.shape[1] // p
        fm = fbank_mask[:, : gt * p].reshape(B, gt, p).any(-1)  # [B, gt] valid
        token_mask = jnp.repeat(fm, T // gt, axis=1)  # time-major (gt, gf) grid
        x = jnp.where(token_mask[..., None], x, 0.0)

    x = x + _pos_conv(params, x)
    x = layer_norm(params["encoder_norm"], x, 1e-5)

    pos_bias = compute_position_bias(params, cfg, T)
    alpha = (2.0 * cfg.num_layers) ** 0.25 if cfg.deep_norm else 1.0

    layer_fn = functools.partial(
        _layer_forward, cfg, pos_bias=pos_bias, key_mask=token_mask, alpha=alpha
    )

    def body(carry, lp):
        return layer_fn(lp, carry), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x, token_mask
