"""Top-level TDC-Video model: towers -> SVA -> segment -> TDC -> LM.

This is the TPU-native replacement for the reference's fusion core
(tdc/cambrian_arch.py: CambrianMetaModel :47 + CambrianMetaForCausalLM :546,
whose single choke point prepare_inputs_labels_for_multimodal :864 mixes
Python loops, per-sample branching and dynamic shapes).  Here the pipeline is
a chain of pure, fixed-shape, vmap-batched stages:

    encode_frames    towers + SVA + newline (+frame_pos)     [T, 156, H]
    encode_audio     fbank + BEATs + per-frame pooling       [T, 50, 768]
    prepare_visual   segmentation + TDC compression          [Vmax, H]
    assemble         dynamic splice at the <image> slot      [Lmax, H]
    forward/loss     decoder stack                           logits / CE

Every stage compiles once per shape bucket and runs for the whole batch at
once (jax.vmap over samples where per-sample state exists).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .compress.assembly import splice_visual_dynamic
from .compress.tdc import compress_video, init_compressor
from .config import TDCConfig
from .constants import IGNORE_INDEX
from .models import lm as lm_mod
from .models.beats import beats_forward, init_beats
from .models.layers import init_linear, linear, normal_init
from .models.sva import init_sva, sva_forward
from .models.vit import init_vit, vit_forward
from .ops.audio import kaldi_fbank, pool_seconds_to_frames, window_to_seconds
from .ops.segment import segment_boundaries

Params = Any


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_tdc(key, cfg: TDCConfig) -> Params:
    """Full parameter tree.  Mirrors the reference module inventory
    (cambrian_arch.py:47-200 + initialize_audio :451 + initialize_compressor
    :469): towers, SVA (aux projectors/samplers/vision_query/mm_projector),
    Q-Former compressor (+query_proj/vision_proj/query_tokens/frame_seg),
    BEATs + audio_proj, image_newline, and the LM."""
    dt = cfg.param_dtype
    ks = jax.random.split(key, 8)
    params = {
        "siglip": init_vit(ks[0], cfg.siglip, dt),
        "dino": init_vit(ks[1], cfg.dino, dt),
        "sva": init_sva(
            ks[2],
            cfg.sva,
            tower_dims=(cfg.siglip.hidden_size, cfg.dino.hidden_size),
            llm_hidden=cfg.lm.hidden_size,
            dtype=dt,
        ),
        "compressor": init_compressor(ks[3], cfg, dt),
        "lm": lm_mod.init_lm(ks[4], cfg.lm, dt),
        # newline column appended to each frame grid (cambrian_arch.py:150-156)
        "image_newline": normal_init(ks[5], (cfg.lm.hidden_size,), dt),
    }
    if cfg.audio_input:
        params["beats"] = init_beats(ks[6], cfg.beats, dt)
        params["audio_proj"] = init_linear(
            ks[7], cfg.beats.encoder_embed_dim, cfg.lm.hidden_size, dt
        )
    return params


def frame_token_len(cfg: TDCConfig) -> int:
    """Tokens per encoded frame: the SVA grid plus one newline per row
    (reference appends image_newline per row, cambrian_arch.py:1273-1281)."""
    side = cfg.sva.final_side_len
    if cfg.compression.is_image_newline:
        return cfg.sva.image_token_len + side
    return cfg.sva.image_token_len


def get_frame_pos(cfg: TDCConfig, frame_indices: jnp.ndarray) -> jnp.ndarray:
    """Sinusoidal temporal embedding per frame, interleaved sin/cos layout
    matching the reference buffer (cambrian_arch.py:152-163, get_frame_pos
    :183-190: out[2k] = sin(t * w_k), out[2k+1] = cos(t * w_k))."""
    H = cfg.lm.hidden_size
    j = jnp.arange(H)
    inv = 1.0 / jnp.power(10000.0, (2 * (j // 2)).astype(jnp.float32) / H)
    ang = frame_indices.astype(jnp.float32)[:, None] * inv[None]  # [T, H]
    even = jnp.sin(ang)
    # reference sets odd slots to cos of the EVEN slot's angle (same angle,
    # since inv[2k] == inv[2k+1])
    return jnp.where(j[None] % 2 == 0, even, jnp.cos(ang))


# ---------------------------------------------------------------------------
# Frame encoding
# ---------------------------------------------------------------------------


def encode_frames(
    cfg: TDCConfig,
    params: Params,
    siglip_px: jnp.ndarray,  # [T, Hs, Ws, 3] normalized
    dino_px: jnp.ndarray,  # [T, Hd, Wd, 3] normalized
    frame_indices: Optional[jnp.ndarray] = None,  # [T] for frame_pos
    attn_impl: str = "xla",
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (frame_feats [T, P, H_lm], dino_feats [T, 576, C_dino]).

    Replaces encode_images + the SVA branch + per-frame newline of the
    reference (cambrian_arch.py:698-745, :964-1052, :1195-1345).  All frames
    run as one tower batch — the reference's chunk-64 loop is just batching.

    remat=True (training): checkpoint the SVA aggregator so the backward
    recomputes its internals from the tower features instead of keeping them
    alive — SVA cross-attention buffers at T=128 frames are ~2.5 GB of the
    stage-3 step's saved activations (PERF.md round 5).  The towers
    themselves need no checkpoint when frozen: their input is data, so no
    gradient ever flows through them (train/trainer.py _sg_frozen).
    """
    dt = cfg.dtype
    dino_feats = vit_forward(cfg.dino, params["dino"], dino_px, attn_impl=attn_impl, dtype=dt)
    siglip_feats = vit_forward(
        cfg.siglip, params["siglip"], siglip_px, attn_impl=attn_impl, dtype=dt
    )
    if remat:
        # SVA is per-frame independent; scan it over frame chunks with one
        # checkpoint per chunk so the backward holds ~CH frames of SVA
        # cross-attention internals instead of all T (4 x 576 MB f32 probs +
        # 3 x 288 MB bf16 buffers at T=128 — PERF.md round 5).  The chunks
        # are still MXU-sized (CH x 576 tokens per tower).
        CH = 16
        Tt = siglip_feats.shape[0]
        pad = (-Tt) % CH
        sig_p = jnp.pad(siglip_feats, ((0, pad),) + ((0, 0),) * (siglip_feats.ndim - 1))
        dino_p = jnp.pad(dino_feats, ((0, pad),) + ((0, 0),) * (dino_feats.ndim - 1))

        def chunk_fn(_, fd):
            return None, sva_forward(cfg.sva, params["sva"], [fd[0], fd[1]])

        _, out = jax.lax.scan(
            jax.checkpoint(chunk_fn),
            None,
            (
                sig_p.reshape((-1, CH) + sig_p.shape[1:]),
                dino_p.reshape((-1, CH) + dino_p.shape[1:]),
            ),
        )
        feats = out.reshape((-1,) + out.shape[2:])[:Tt]  # [T, 144, H]
    else:
        feats = sva_forward(cfg.sva, params["sva"], [siglip_feats, dino_feats])  # [T, 144, H]

    T = feats.shape[0]
    side = cfg.sva.final_side_len
    H = feats.shape[-1]
    if cfg.compression.is_image_newline:
        grid = feats.reshape(T, side, side, H)
        nl = jnp.broadcast_to(
            params["image_newline"].astype(grid.dtype)[None, None, None], (T, side, 1, H)
        )
        feats = jnp.concatenate([grid, nl], axis=2).reshape(T, side * (side + 1), H)

    if cfg.compression.frame_pos and frame_indices is not None:
        feats = feats + get_frame_pos(cfg, frame_indices).astype(feats.dtype)[:, None, :]
    return feats, dino_feats


# ---------------------------------------------------------------------------
# Audio encoding
# ---------------------------------------------------------------------------


def encode_audio(
    cfg: TDCConfig,
    params: Params,
    wav_windows: jnp.ndarray,  # [W, 160000] 10-s windows of 16 kHz audio
    wav_mask: jnp.ndarray,  # [W, 160000] bool
    frame_of_sec: jnp.ndarray,  # [S=W*10] int32 (ops.audio.second_groups)
    group_pos: jnp.ndarray,  # [S]
    group_size: jnp.ndarray,  # [T]
    num_frames: int,
    sec_valid: Optional[jnp.ndarray] = None,  # [S] bool
) -> jnp.ndarray:
    """Returns per-frame audio tokens [num_frames, 50, H_lm] (already
    audio_proj'ed — reference applies audio_proj at chunk assembly,
    cambrian_arch.py:1612-1614; hoisted here so compression sees LM-space
    features either way)."""
    fb = kaldi_fbank(wav_windows)
    fb_mask = wav_mask[:, :: 160][:, : fb.shape[1]]
    tokens, _ = beats_forward(cfg.beats, params["beats"], fb, fb_mask, dtype=cfg.dtype)
    per_sec = window_to_seconds(tokens)  # [W, 10, 50, 768]
    W = per_sec.shape[0]
    per_sec = per_sec.reshape(W * 10, per_sec.shape[2], per_sec.shape[3])
    frame_audio = pool_seconds_to_frames(
        per_sec, frame_of_sec, group_pos, group_size, num_frames, sec_valid
    )
    return linear(params["audio_proj"], frame_audio.astype(cfg.dtype))


# ---------------------------------------------------------------------------
# Visual preparation (segment + compress), single sample
# ---------------------------------------------------------------------------


def prepare_visual(
    cfg: TDCConfig,
    params: Params,
    frame_feats: jnp.ndarray,  # [T, P, H]
    dino_feats: jnp.ndarray,  # [T, 576, C]
    frame_mask: jnp.ndarray,  # [T] bool
    qformer_text_ids: Optional[jnp.ndarray],  # [Lq]
    qformer_text_mask: Optional[jnp.ndarray],  # [Lq]
    audio_tokens: Optional[jnp.ndarray] = None,  # [T, 50, H]
    max_visual_len: int = 4096,
    token_valid: Optional[jnp.ndarray] = None,  # [P] aspect mask (compress/aspect.py)
    query_pool: Optional[jnp.ndarray] = None,  # [K, P]
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segmentation + TDC compression for ONE video.  Returns
    (visual [max_visual_len, H], n_visual)."""
    boundary = segment_boundaries(dino_feats, frame_mask, cfg.compression.max_num_segments)
    return compress_video(
        cfg,
        params["compressor"],
        frame_feats,
        frame_mask,
        boundary,
        qformer_text_ids,
        qformer_text_mask,
        audio_feats=audio_tokens,
        max_visual_len=max_visual_len,
        dtype=cfg.compress_dtype,
        token_valid=token_valid,
        query_pool=query_pool,
        remat=remat,
    )


# ---------------------------------------------------------------------------
# Full multimodal forward
# ---------------------------------------------------------------------------


def prepare_multimodal_inputs(
    cfg: TDCConfig,
    params: Params,
    input_ids: jnp.ndarray,  # [B, L]; <image> slot already a placeholder id
    image_pos: jnp.ndarray,  # [B] position of the <image> token
    siglip_px: jnp.ndarray,  # [B, T, Hs, Ws, 3]
    dino_px: jnp.ndarray,  # [B, T, Hd, Wd, 3]
    frame_mask: jnp.ndarray,  # [B, T]
    qformer_text_ids: Optional[jnp.ndarray],  # [B, Lq]
    qformer_text_mask: Optional[jnp.ndarray],  # [B, Lq]
    audio_tokens: Optional[jnp.ndarray] = None,  # [B, T, 50, H] precomputed
    audio_windows: Optional[jnp.ndarray] = None,  # [B, W, 160000] raw 10-s wav
    audio_wmask: Optional[jnp.ndarray] = None,  # [B, W, 160000]
    audio_frame_of_sec: Optional[jnp.ndarray] = None,  # [B, S]
    audio_group_pos: Optional[jnp.ndarray] = None,  # [B, S]
    audio_group_size: Optional[jnp.ndarray] = None,  # [B, T]
    audio_sec_valid: Optional[jnp.ndarray] = None,  # [B, S]
    labels: Optional[jnp.ndarray] = None,  # [B, L]
    text_len: Optional[jnp.ndarray] = None,  # [B] valid text length (right-padded)
    has_image: Optional[jnp.ndarray] = None,  # [B] bool; False rows splice no visual
    token_valid: Optional[jnp.ndarray] = None,  # [B, P] per-sample aspect masks
    query_pool: Optional[jnp.ndarray] = None,  # [B, K, P]
    frame_indices: Optional[jnp.ndarray] = None,  # [B, T] time indices (frame_pos)
    max_len: int = 4096,
    max_visual_len: int = 2048,
    attn_impl: str = "xla",
    remat_encode: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Batched equivalent of prepare_inputs_labels_for_multimodal
    (cambrian_arch.py:864-1844): returns dict(embeds [B, max_len, H],
    attn_mask, labels, seq_len).

    remat_encode=True (training): checkpoint the audio encoder, the SVA
    aggregator and the segment+compress stage so only their INPUTS (tower
    features, pooled audio) are saved for the backward — the Q-Former /
    SVA internals otherwise kept alive for the vjp through the (frozen or
    trainable) compressor dominate training memory (PERF.md round 5)."""
    B, T = frame_mask.shape
    if frame_indices is None and cfg.compression.frame_pos:
        # positional fallback when the caller has no timestamps (reference
        # passes selected_frame_indices, cambrian_arch.py:1329-1339)
        frame_indices = jnp.broadcast_to(jnp.arange(T)[None], (B, T))

    if audio_tokens is None and audio_windows is not None:
        # In-graph audio encode (training: gradients reach BEATs/audio_proj
        # when unfrozen; reference encodes audio inside forward,
        # cambrian_arch.py:1547-1560)
        _enc_audio = lambda w, wm, f, p_, g, sv: encode_audio(
            cfg, params, w, wm, f, p_, g, T, sv
        )
        if remat_encode:
            _enc_audio = jax.checkpoint(_enc_audio)
        audio_tokens = jax.vmap(_enc_audio)(
            audio_windows,
            audio_wmask,
            audio_frame_of_sec,
            audio_group_pos,
            audio_group_size,
            audio_sec_valid,
        )

    flat_sig = siglip_px.reshape((B * T,) + siglip_px.shape[2:])
    flat_dino = dino_px.reshape((B * T,) + dino_px.shape[2:])
    flat_idx = None if frame_indices is None else frame_indices.reshape(B * T)
    frame_feats, dino_feats = encode_frames(
        cfg, params, flat_sig, flat_dino, frame_indices=flat_idx,
        attn_impl=attn_impl, remat=remat_encode,
    )
    P = frame_feats.shape[1]
    frame_feats = frame_feats.reshape(B, T, P, -1)
    dino_feats = dino_feats.reshape(B, T, dino_feats.shape[1], -1)

    return prepare_multimodal_from_features(
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
        labels=labels,
        text_len=text_len,
        has_image=has_image,
        token_valid=token_valid,
        query_pool=query_pool,
        max_len=max_len,
        max_visual_len=max_visual_len,
        remat_encode=remat_encode,
    )


def prepare_multimodal_from_features(
    cfg: TDCConfig,
    params: Params,
    input_ids: jnp.ndarray,  # [B, L]
    image_pos: jnp.ndarray,  # [B]
    frame_feats: jnp.ndarray,  # [B, T, P, H] encoded frames (encode_frames)
    dino_feats: jnp.ndarray,  # [B, T, Nd, Cd]
    frame_mask: jnp.ndarray,  # [B, T]
    qformer_text_ids: Optional[jnp.ndarray],
    qformer_text_mask: Optional[jnp.ndarray],
    audio_tokens: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    text_len: Optional[jnp.ndarray] = None,
    has_image: Optional[jnp.ndarray] = None,
    token_valid: Optional[jnp.ndarray] = None,
    query_pool: Optional[jnp.ndarray] = None,
    max_len: int = 4096,
    max_visual_len: int = 2048,
    remat_encode: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Compression + splice over PRE-ENCODED frame features: lets callers
    (eval predictor, LVCoT, multi-question videos) encode a video once and
    answer many prompts against the cached features."""
    B, T = frame_mask.shape
    P = frame_feats.shape[2]

    if token_valid is None:
        token_valid = jnp.ones((B, P), jnp.bool_)
    if query_pool is None:
        from .ops.pooling import adaptive_pool_matrix

        K = cfg.compression.context_token_num
        query_pool = jnp.broadcast_to(
            jnp.asarray(adaptive_pool_matrix(P, K))[None], (B, K, P)
        )

    def one(ff, df, fm, tid, tmask, tv, qp, atok):
        return prepare_visual(
            cfg, params, ff, df, fm, tid, tmask, atok,
            max_visual_len=max_visual_len, token_valid=tv, query_pool=qp,
            remat=remat_encode,
        )

    if remat_encode:
        # backward through the (frozen or trainable) Q-Former to the
        # trainable projector keeps ~6 GB of qformer internals alive at
        # stage-1 shapes without this checkpoint (PERF.md round 5)
        one = jax.checkpoint(one)

    if audio_tokens is None:
        visual, n_visual = jax.vmap(
            lambda a, b, c, d, e, f, g: one(a, b, c, d, e, f, g, None)
        )(frame_feats, dino_feats, frame_mask, qformer_text_ids, qformer_text_mask,
          token_valid, query_pool)
    else:
        visual, n_visual = jax.vmap(one)(
            frame_feats, dino_feats, frame_mask, qformer_text_ids, qformer_text_mask,
            token_valid, query_pool, audio_tokens,
        )

    text_embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], input_ids, cfg.dtype)
    visual = visual.astype(text_embeds.dtype)
    if text_len is None:
        text_len = jnp.full((B,), input_ids.shape[1], jnp.int32)
    if has_image is None:
        has_image = jnp.ones((B,), jnp.bool_)

    def splice(te, ipos, vis, nv, tl, hi, lab):
        return splice_visual_dynamic(
            te, ipos, vis, nv, max_len, labels=lab, text_len=tl, has_image=hi
        )

    if labels is None:
        embeds, attn_mask, _, seq_len = jax.vmap(
            lambda te, ipos, vis, nv, tl, hi: splice(te, ipos, vis, nv, tl, hi, None)
        )(text_embeds, image_pos, visual, n_visual, text_len, has_image)
        out_labels = None
    else:
        embeds, attn_mask, out_labels, seq_len = jax.vmap(splice)(
            text_embeds, image_pos, visual, n_visual, text_len, has_image, labels
        )
    return {
        "embeds": embeds,
        "attn_mask": attn_mask,
        "labels": out_labels,
        "seq_len": seq_len,
    }


def prepare_multimodal_multi_image(
    cfg: TDCConfig,
    params: Params,
    input_ids: jnp.ndarray,  # [B, L]
    image_pos_multi: jnp.ndarray,  # [B, M] ascending <image> positions, -1 pad
    siglip_px: jnp.ndarray,  # [B, M, Hs, Ws, 3] one image per slot
    dino_px: jnp.ndarray,  # [B, M, Hd, Wd, 3]
    labels: Optional[jnp.ndarray] = None,  # [B, L]
    text_len: Optional[jnp.ndarray] = None,  # [B]
    max_len: int = 4096,
    attn_impl: str = "xla",
) -> Dict[str, jnp.ndarray]:
    """Stage-1-style conversations with MULTIPLE <image> tokens per sample
    (the reference splice loop handles any count, cambrian_arch.py:1457-1734;
    mm_datautils.py:579 splits on every <image>).  Each image contributes its
    uncompressed SVA grid (+newline) tokens — no TDC compression, matching the
    reference's image path (image_token_len, scripts/stage1)."""
    from .compress.assembly import splice_visual_multi

    B, M = image_pos_multi.shape
    flat_sig = siglip_px.reshape((B * M,) + siglip_px.shape[2:])
    flat_dino = dino_px.reshape((B * M,) + dino_px.shape[2:])
    feats, _ = encode_frames(cfg, params, flat_sig, flat_dino, attn_impl=attn_impl)
    P = feats.shape[1]
    visual = feats.reshape(B, M, P, -1)

    text_embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], input_ids, cfg.dtype)
    visual = visual.astype(text_embeds.dtype)
    n_visual = jnp.full((B, M), P, jnp.int32)
    if text_len is None:
        text_len = jnp.full((B,), input_ids.shape[1], jnp.int32)

    def splice(te, ipos, vis, nv, tl, lab):
        return splice_visual_multi(te, ipos, vis, nv, max_len, labels=lab, text_len=tl)

    if labels is None:
        embeds, attn_mask, _, seq_len = jax.vmap(
            lambda te, ipos, vis, nv, tl: splice(te, ipos, vis, nv, tl, None)
        )(text_embeds, image_pos_multi, visual, n_visual, text_len)
        out_labels = None
    else:
        embeds, attn_mask, out_labels, seq_len = jax.vmap(splice)(
            text_embeds, image_pos_multi, visual, n_visual, text_len, labels
        )
    return {
        "embeds": embeds,
        "attn_mask": attn_mask,
        "labels": out_labels,
        "seq_len": seq_len,
    }


def tdc_loss(
    cfg: TDCConfig,
    params: Params,
    batch: Dict[str, jnp.ndarray],
    max_len: int = 4096,
    max_visual_len: int = 2048,
    attn_impl: str = "xla",
    remat: bool = True,
    loss_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Training loss for a multimodal batch (reference training path:
    cambrian_qwen.py:232 -> prepare_inputs... -> CE :374-385).  loss_chunk:
    chunked CE for long contexts (models/lm.lm_loss)."""
    mm = prepare_multimodal_inputs(
        cfg,
        params,
        batch["input_ids"],
        batch["image_pos"],
        batch["siglip_px"],
        batch["dino_px"],
        batch["frame_mask"],
        batch.get("qformer_text_ids"),
        batch.get("qformer_text_mask"),
        audio_tokens=batch.get("audio_tokens"),
        audio_windows=batch.get("audio_windows"),
        audio_wmask=batch.get("audio_wmask"),
        audio_frame_of_sec=batch.get("audio_frame_of_sec"),
        audio_group_pos=batch.get("audio_group_pos"),
        audio_group_size=batch.get("audio_group_size"),
        audio_sec_valid=batch.get("audio_sec_valid"),
        labels=batch["labels"],
        text_len=batch.get("text_len"),
        has_image=batch.get("has_image"),
        token_valid=batch.get("token_valid"),
        query_pool=batch.get("query_pool"),
        max_len=max_len,
        max_visual_len=max_visual_len,
        attn_impl=attn_impl,
        remat_encode=remat,
    )
    return lm_mod.lm_loss(
        cfg.lm,
        params["lm"],
        mm["embeds"],
        mm["labels"],
        mm["attn_mask"],
        attn_impl=attn_impl,
        remat=remat,
        dtype=cfg.dtype,
        loss_chunk=loss_chunk,
    )
