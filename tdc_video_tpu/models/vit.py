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


def _layer_forward(
    cfg: ViTConfig, p: Params, x: jnp.ndarray, attn_impl: str, calibrate: bool = False
):
    B, N, D = x.shape
    nh = cfg.num_heads
    hd = D // nh
    # int8 towers (models/quant.py quantize_vit_int8): projections run
    # s8 x s8 on the MXU.  Activation scales are dynamic per-token by
    # default; when the layer carries calibrated static scales
    # (p["act_scale"], one scalar per quantization site, stacked [L] and
    # sliced by the scan) the amax pass disappears and the round/clip fuses
    # into the producer (PERF.md, round 3).  q/k/v consume ONE shared
    # quantization of the LN output (the separate per-call amax+round was
    # 3x the elementwise/HBM cost for nothing).
    int8 = "w_q" in p["q_proj"]
    asc = p.get("act_scale") if int8 else None
    stats = {}

    def site_scale(site):
        return None if asc is None else asc[site]

    def qlin(pp, xx, site):
        if "w_q" in pp:
            xq, xs = int8_qact(xx, site_scale(site))
            return int8_dot(xq, xs, pp, x.dtype)
        return linear(pp, xx)

    h = layer_norm(p["norm1"], x, cfg.layer_norm_eps)
    if calibrate:
        stats["qkv"] = jnp.max(jnp.abs(h.astype(jnp.float32)))
    if int8:
        hq, hs = int8_qact(h, site_scale("qkv"))
        q = int8_dot(hq, hs, p["q_proj"], x.dtype).reshape(B, N, nh, hd)
        k = int8_dot(hq, hs, p["k_proj"], x.dtype).reshape(B, N, nh, hd)
        v = int8_dot(hq, hs, p["v_proj"], x.dtype).reshape(B, N, nh, hd)
    else:
        q = linear(p["q_proj"], h).reshape(B, N, nh, hd)
        k = linear(p["k_proj"], h).reshape(B, N, nh, hd)
        v = linear(p["v_proj"], h).reshape(B, N, nh, hd)
    a = attention(q, k, v, impl=attn_impl).reshape(B, N, D)
    if calibrate:
        stats["attn"] = jnp.max(jnp.abs(a.astype(jnp.float32)))
    a = qlin(p["o_proj"], a, "attn")
    if cfg.layerscale:
        a = a * p["ls1"].astype(a.dtype)
    x = x + a

    h = layer_norm(p["norm2"], x, cfg.layer_norm_eps)
    if calibrate:
        stats["mlp"] = jnp.max(jnp.abs(h.astype(jnp.float32)))
    if cfg.use_swiglu:
        if int8:
            # Two sliced dots instead of one concatenated gate_up dot: with
            # a single [D, 2F] dot the split->silu(g)*u consumer reads two
            # slices of the dot output, which blocks XLA from output-fusing
            # the activation+quantize chain — the 2F-wide bf16 tensor hits
            # HBM and a separate clamp/convert pass re-reads it (measured
            # ~200 ms across DINO, PERF.md round 3).  With separate g/u
            # dots the silu*mul(+quant) fuses into the u-dot epilogue the
            # same way SigLIP's gelu+quant does.  The weight slices fuse
            # into the dot operand load (no copy).
            gup = p["mlp"]["gate_up"]
            F = gup["w_q"].shape[-1] // 2
            hq2, hs2 = int8_qact(h, site_scale("mlp"))
            gp = {"w_q": gup["w_q"][:, :F], "w_scale": gup["w_scale"][:F]}
            up = {"w_q": gup["w_q"][:, F:], "w_scale": gup["w_scale"][F:]}
            if "b" in gup:
                gp["b"], up["b"] = gup["b"][:F], gup["b"][F:]
            g = int8_dot(hq2, hs2, gp, x.dtype)
            u = int8_dot(hq2, hs2, up, x.dtype)
        else:
            gu = qlin(p["mlp"]["gate_up"], h, "mlp")
            g, u = jnp.split(gu, 2, axis=-1)
        inner = jax.nn.silu(g) * u
    else:
        inner = jax.nn.gelu(qlin(p["mlp"]["fc1"], h, "mlp"), approximate=True)
    if calibrate:
        stats["down"] = jnp.max(jnp.abs(inner.astype(jnp.float32)))
    m = qlin(p["mlp"]["down"] if cfg.use_swiglu else p["mlp"]["fc2"], inner, "down")
    if cfg.layerscale:
        m = m * p["ls2"].astype(m.dtype)
    return x + m, stats


def vit_forward(
    cfg: ViTConfig,
    params: Params,
    pixels: jnp.ndarray,  # [B, H, W, 3] normalized
    interpolate: bool = True,
    attn_impl: str = "xla",
    dtype=jnp.float32,
    calibrate: bool = False,
) -> jnp.ndarray:
    """Returns patch features [B, N(or interp_tokens), C]; CLS dropped.
    calibrate=True (float params only) additionally returns per-layer
    activation-amax statistics {"qkv","attn","mlp","down"}: [L] — the input
    to models/quant.calibrate_vit_act_scales."""
    x = patchify(pixels.astype(dtype), cfg.patch_size)
    x = linear(params["patch_embed"], x, act_quant=True)
    B = x.shape[0]
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None]

    layer_fn = functools.partial(
        _layer_forward, cfg, attn_impl=attn_impl, calibrate=calibrate
    )

    def body(carry, lp):
        return layer_fn(lp, carry)

    x, stats = jax.lax.scan(body, x, params["layers"])

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
    if calibrate:
        return x, stats
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
