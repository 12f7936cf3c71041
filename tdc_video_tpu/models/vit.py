"""Generic ViT encoder serving the SigLIP and DINOv2 towers.

Reference towers (frozen): google/siglip-so400m-patch14-384
(tdc/multimodal_encoder/siglip_encoder.py) and facebook/dinov2-giant @ 378 px
(tdc/multimodal_encoder/dino_encoder.py).  Differences are config-driven:
DINOv2 adds a CLS token (dropped from the output, dino_encoder.py:66-79),
LayerScale, and a SwiGLU FFN; SigLIP uses biased attention + tanh-GELU MLP and
a final post-layernorm.

TPU-first notes: the patch conv is a single dense matmul over flattened
patches (MXU-shaped [B*N, P*P*3] x [P*P*3, C]); frames are batched on the
leading axis so video encode is one big batched matmul stream; layers run
under lax.scan.  Both towers bilinear-resize their patch grid to
`interp_tokens` (576 = 24x24) exactly like the reference interpolate()
(siglip_encoder.py:43-70).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..config import ViTConfig
from .attention import attention
from .layers import (
    init_layer_norm,
    init_linear,
    int8_dot,
    int8_qact,
    layer_norm,
    linear,
    normal_init,
)

Params = Any


def _init_layer(key, cfg: ViTConfig, dtype):
    ks = jax.random.split(key, 8)
    d, f = cfg.hidden_size, cfg.intermediate_size
    p = {
        "norm1": init_layer_norm(d, dtype),
        "q_proj": init_linear(ks[0], d, d, dtype),
        "k_proj": init_linear(ks[1], d, d, dtype),
        "v_proj": init_linear(ks[2], d, d, dtype),
        "o_proj": init_linear(ks[3], d, d, dtype),
        "norm2": init_layer_norm(d, dtype),
    }
    if cfg.use_swiglu:
        p["mlp"] = {
            "gate_up": init_linear(ks[4], d, 2 * f, dtype),
            "down": init_linear(ks[5], f, d, dtype),
        }
    else:
        p["mlp"] = {
            "fc1": init_linear(ks[4], d, f, dtype),
            "fc2": init_linear(ks[5], f, d, dtype),
        }
    if cfg.layerscale:
        p["ls1"] = jnp.ones((d,), dtype)
        p["ls2"] = jnp.ones((d,), dtype)
    return p


def init_vit(key, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    kp, kpos, kcls, kl = jax.random.split(key, 4)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    n_pos = cfg.num_patches + (1 if cfg.use_cls_token else 0)
    layers = jax.vmap(lambda k: _init_layer(k, cfg, dtype))(
        jax.random.split(kl, cfg.num_layers)
    )
    params = {
        "patch_embed": init_linear(kp, patch_dim, cfg.hidden_size, dtype),
        "pos_embed": normal_init(kpos, (n_pos, cfg.hidden_size), dtype),
        "layers": layers,
        "final_norm": init_layer_norm(cfg.hidden_size, dtype),
    }
    if cfg.use_cls_token:
        params["cls_token"] = normal_init(kcls, (cfg.hidden_size,), dtype)
    return params


def patchify(pixels: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, N, P*P*3] with (ph, pw, c) minor order (matches the
    torch conv-weight flattening used in convert/from_hf.py)."""
    B, H, W, C = pixels.shape
    gh, gw = H // patch, W // patch
    # stride-`patch` valid conv drops trailing pixels when H % patch != 0
    # (siglip-so400m: 384 px / patch 14 -> 27x27 grid, last 6 px unused)
    x = pixels[:, : gh * patch, : gw * patch].reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, gh * gw, patch * patch * C)


def bilinear_resize_tokens(tokens: jnp.ndarray, src_side: int, dst_side: int) -> jnp.ndarray:
    """[B, src*src, C] -> [B, dst*dst, C], matching torch F.interpolate
    (bilinear, align_corners=False, no antialias) as used at
    siglip_encoder.py:55-60.  Computed in f32."""
    if src_side == dst_side:
        return tokens
    B, N, C = tokens.shape
    x = tokens.reshape(B, src_side, src_side, C).astype(jnp.float32)
    out = jax.image.resize(x, (B, dst_side, dst_side, C), method="linear", antialias=False)
    return out.reshape(B, dst_side * dst_side, C).astype(tokens.dtype)


def _layer_forward(cfg: ViTConfig, p: Params, x: jnp.ndarray, attn_impl: str):
    B, N, D = x.shape
    nh = cfg.num_heads
    hd = D // nh
    # act_quant: when the tower is int8-quantized (models/quant.py
    # quantize_vit_int8) the projections run s8 x s8 on the MXU with
    # per-token dynamic activation scales; a no-op for float weights.
    # q/k/v consume ONE shared quantization of the LN output (the separate
    # per-call amax+round was 3x the elementwise/HBM cost for nothing).
    lin = functools.partial(linear, act_quant=True)
    int8 = "w_q" in p["q_proj"]
    h = layer_norm(p["norm1"], x, cfg.layer_norm_eps)
    if int8:
        hq, hs = int8_qact(h)
        q = int8_dot(hq, hs, p["q_proj"], x.dtype).reshape(B, N, nh, hd)
        k = int8_dot(hq, hs, p["k_proj"], x.dtype).reshape(B, N, nh, hd)
        v = int8_dot(hq, hs, p["v_proj"], x.dtype).reshape(B, N, nh, hd)
    else:
        q = lin(p["q_proj"], h).reshape(B, N, nh, hd)
        k = lin(p["k_proj"], h).reshape(B, N, nh, hd)
        v = lin(p["v_proj"], h).reshape(B, N, nh, hd)
    a = attention(q, k, v, impl=attn_impl).reshape(B, N, D)
    a = lin(p["o_proj"], a)
    if cfg.layerscale:
        a = a * p["ls1"].astype(a.dtype)
    x = x + a

    h = layer_norm(p["norm2"], x, cfg.layer_norm_eps)
    if cfg.use_swiglu:
        gu = lin(p["mlp"]["gate_up"], h)
        g, u = jnp.split(gu, 2, axis=-1)
        m = lin(p["mlp"]["down"], jax.nn.silu(g) * u)
    else:
        m = lin(p["mlp"]["fc2"], jax.nn.gelu(lin(p["mlp"]["fc1"], h), approximate=True))
    if cfg.layerscale:
        m = m * p["ls2"].astype(m.dtype)
    return x + m


def vit_forward(
    cfg: ViTConfig,
    params: Params,
    pixels: jnp.ndarray,  # [B, H, W, 3] normalized
    interpolate: bool = True,
    attn_impl: str = "xla",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns patch features [B, N(or interp_tokens), C]; CLS dropped."""
    x = patchify(pixels.astype(dtype), cfg.patch_size)
    x = linear(params["patch_embed"], x, act_quant=True)
    B = x.shape[0]
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None]

    layer_fn = functools.partial(_layer_forward, cfg, attn_impl=attn_impl)

    def body(carry, lp):
        return layer_fn(lp, carry), None

    x, _ = jax.lax.scan(body, x, params["layers"])

    if cfg.name == "siglip":
        # HF SiglipVisionTransformer applies post_layernorm to last_hidden_state.
        x = layer_norm(params["final_norm"], x, cfg.layer_norm_eps)
    else:
        # HF Dinov2Model also layernorms the sequence output.
        x = layer_norm(params["final_norm"], x, cfg.layer_norm_eps)

    if cfg.use_cls_token:
        x = x[:, 1:]  # drop CLS (reference feature_select "patch", dino_encoder.py:66-79)

    if interpolate:
        x = bilinear_resize_tokens(x, cfg.grid_size, int(cfg.interp_tokens**0.5))
    return x


def prepare_pos_embed(params: Params, cfg: ViTConfig) -> Params:
    """Resize a checkpoint's position grid to this config's grid size (DINOv2
    ships a 518-px table; the reference runs it at 378 px).  Bicubic, f32,
    matching HF Dinov2Embeddings.interpolate_pos_encoding."""
    pos = params["pos_embed"]
    n_extra = 1 if cfg.use_cls_token else 0
    n_target = cfg.num_patches + n_extra
    if pos.shape[0] == n_target:
        return params
    grid = pos[n_extra:]
    src_side = int(grid.shape[0] ** 0.5)
    dst_side = cfg.grid_size
    g = grid.reshape(1, src_side, src_side, -1).astype(jnp.float32)
    g = jax.image.resize(g, (1, dst_side, dst_side, g.shape[-1]), "cubic", antialias=False)
    g = g.reshape(dst_side * dst_side, -1).astype(pos.dtype)
    new = jnp.concatenate([pos[:n_extra], g], axis=0)
    return dict(params, pos_embed=new)
