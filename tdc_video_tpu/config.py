"""Single dataclass config tree for the whole framework.

Replaces the reference's three-way config soup (HfArgumentParser dataclasses in
tdc/train.py:65-158, HF config.json attributes read back via getattr in
tdc/cambrian_arch.py:1508-1511, and shell-script flags in scripts/).  Knob names
are kept identical to the reference (`context_token_num`, `max_num_segments`,
`query_type`, `add_static`, `text_input`, `audio_input`, ...) so parity
experiments can be configured 1:1.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax.numpy as jnp


def _replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


# ---------------------------------------------------------------------------
# Language model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LMConfig:
    """Decoder-only transformer config (covers Qwen2 and Llama-3.x).

    Both reference LLMs (tdc/language_model/cambrian_qwen.py:48,
    cambrian_llama.py:58) are GQA + SwiGLU + RMSNorm decoders; one core serves
    both, differing only in these hyperparameters.
    """

    name: str = "qwen2"
    vocab_size: int = 152064
    hidden_size: int = 3584
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    intermediate_size: int = 18944
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    # Llama-3 style rope scaling: (factor, low_freq_factor, high_freq_factor,
    # original_max_position_embeddings); None disables.
    rope_scaling: Optional[Tuple[float, float, float, int]] = None
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    attention_bias: bool = True  # qwen2 uses qkv bias, llama does not
    pad_token_id: int = 151643
    eos_token_ids: Tuple[int, ...] = (151645, 151643)

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


QWEN2_7B = LMConfig()

LLAMA32_3B = LMConfig(
    name="llama",
    vocab_size=128256,
    hidden_size=3072,
    num_layers=28,
    num_heads=24,
    num_kv_heads=8,
    head_dim=128,
    intermediate_size=8192,
    rms_norm_eps=1e-5,
    rope_theta=500000.0,
    rope_scaling=(32.0, 1.0, 4.0, 8192),
    max_position_embeddings=131072,
    tie_word_embeddings=True,
    attention_bias=False,
    pad_token_id=128002,
    eos_token_ids=(128009, 128001),
)

# Small configs for tests / CI (CPU-mesh friendly).
LM_TINY = LMConfig(
    name="qwen2",
    vocab_size=512,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=512,
    pad_token_id=0,
    eos_token_ids=(1,),
)


# ---------------------------------------------------------------------------
# Vision towers
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViTConfig:
    """Generic ViT encoder config serving SigLIP and DINOv2.

    Reference towers: google/siglip-so400m-patch14-384
    (tdc/multimodal_encoder/siglip_encoder.py:14) and facebook/dinov2-giant at
    378 px (tdc/multimodal_encoder/dino_encoder.py).
    """

    name: str = "siglip"
    image_size: int = 384
    patch_size: int = 14
    hidden_size: int = 1152
    num_layers: int = 27
    num_heads: int = 16
    intermediate_size: int = 4304
    layer_norm_eps: float = 1e-6
    use_cls_token: bool = False  # dinov2 has CLS (dropped from output), siglip none
    use_swiglu: bool = False  # dinov2-giant FFN is SwiGLU
    layerscale: bool = False  # dinov2 uses LayerScale
    # Number of output tokens after bilinear interpolation of the patch grid
    # (reference interp to 576 = 24x24, siglip_encoder.py:43-70).
    interp_tokens: int = 576

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size


SIGLIP_SO400M = ViTConfig()

DINOV2_GIANT = ViTConfig(
    name="dinov2",
    image_size=378,
    patch_size=14,
    hidden_size=1536,
    num_layers=40,
    num_heads=24,
    intermediate_size=4096,
    use_cls_token=True,
    use_swiglu=True,
    layerscale=True,
)

VIT_TINY = ViTConfig(
    name="siglip",
    image_size=56,
    patch_size=14,
    hidden_size=32,
    num_layers=2,
    num_heads=2,
    intermediate_size=64,
    interp_tokens=16,
)

VIT_TINY_DINO = ViTConfig(
    name="dinov2",
    image_size=56,
    patch_size=14,
    hidden_size=48,
    num_layers=2,
    num_heads=2,
    intermediate_size=96,
    use_cls_token=True,
    use_swiglu=True,
    layerscale=True,
    interp_tokens=16,
)


# ---------------------------------------------------------------------------
# Q-Former (TDC compressor)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class QFormerConfig:
    """BERT-with-cross-attention compressor (reference tdc/Qformer.py, built
    from bert-base-uncased with cross_attention_freq=2, tdc/cambrian_arch.py:403-424)."""

    vocab_size: int = 30523  # bert-base + 1 extra ([DEC]) slot used by BLIP-2 lineage
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    cross_attention_freq: int = 2
    encoder_width: int = 3584  # dim of visual inputs cross-attended to (LLM hidden)
    query_length: int = 16


QFORMER_BASE = QFormerConfig()

QFORMER_TINY = QFormerConfig(
    vocab_size=128,
    hidden_size=32,
    num_layers=4,
    num_heads=2,
    intermediate_size=64,
    max_position_embeddings=64,
    encoder_width=64,
    query_length=4,
)


# ---------------------------------------------------------------------------
# Audio encoder (BEATs)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BeatsConfig:
    """BEATs audio transformer (reference tdc/audio_models/beats/BEATs.py:69).

    128-bin kaldi fbank -> 16x16 patch conv -> 768-d transformer with
    relative-position gated attention; ~50 tokens per second of 16 kHz audio.
    """

    embed_dim: int = 512  # patch-embed conv output
    encoder_embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    fbank_bins: int = 128
    patch_size: int = 16
    conv_bias: bool = False
    layer_norm_first: bool = False
    deep_norm: bool = True
    gru_rel_pos: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    dropout: float = 0.0
    fbank_mean: float = 15.41663
    fbank_std: float = 6.55582


BEATS_BASE = BeatsConfig()

BEATS_TINY = BeatsConfig(
    embed_dim=16,
    encoder_embed_dim=32,
    num_layers=2,
    num_heads=2,
    ffn_dim=64,
    num_buckets=32,
    max_distance=64,
)


# ---------------------------------------------------------------------------
# SVA connector
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SVAConfig:
    """Spatial Vision Aggregator (reference tdc/vision_sampler.py:519 +
    cambrian_arch.py:55-146)."""

    vision_hidden_size: int = 1024
    num_query_group: int = 1
    query_num_list: Tuple[int, ...] = (576,)
    connector_depth: int = 3
    image_token_len: int = 576  # final 24x24 query grid
    num_heads: int = 16
    tower_token_len_list: Tuple[int, ...] = (576, 576)
    connector_only: bool = True

    @property
    def query_side_len(self) -> int:
        return int(self.query_num_list[0] ** 0.5)

    @property
    def final_side_len(self) -> int:
        return int(self.image_token_len**0.5)


SVA_DEFAULT = SVAConfig()

# Video flagship connector: 12x12=144 query grid (stage 2/3 scripts,
# scripts/stage2/train_video_qwen.sh:51-52 image_token_len 144,
# query_num_list [144]); SVA_DEFAULT (576) is the stage-1 image setting.
SVA_VIDEO = SVAConfig(query_num_list=(144,), image_token_len=144)

SVA_TINY = SVAConfig(
    vision_hidden_size=32,
    query_num_list=(16,),
    image_token_len=16,
    num_heads=2,
    tower_token_len_list=(16, 16),
)


# ---------------------------------------------------------------------------
# TDC compression
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CompressionConfig:
    """Temporal Dynamic Context compression knobs.

    Names mirror the reference config attributes (cambrian_arch.py:1508-1511,
    train.py:112-121): K context tokens per subsequent frame, <=max_num_segments
    scene segments, chunks of `chunk_size` frames, avg-pooled static-frame query,
    text conditioning, and a separator token between frames.
    """

    context_token_num: int = 16
    max_num_segments: int = 24
    chunk_size: int = 8
    query_type: str = "Avg_pool"  # or "learned"
    add_static: bool = True
    text_input: bool = True
    add_sep: bool = True
    audio_input: bool = False
    dino_threshold: float = 0.83
    dino_window_size: int = 64
    max_train_frames: int = 224
    max_eval_frames: int = 1000
    frame_pos: bool = False
    is_image_newline: bool = True
    qformer_text_max_len: int = 256


# ---------------------------------------------------------------------------
# Top-level model config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TDCConfig:
    """Everything needed to build a TDC-Video model."""

    lm: LMConfig = QWEN2_7B
    siglip: ViTConfig = SIGLIP_SO400M
    dino: ViTConfig = DINOV2_GIANT
    qformer: QFormerConfig = QFORMER_BASE
    beats: BeatsConfig = BEATS_BASE
    sva: SVAConfig = SVA_DEFAULT
    compression: CompressionConfig = CompressionConfig()

    conv_version: str = "qwen"
    tokenizer_model_max_length: int = 8192
    inference_max_length: int = 16
    video_fps: float = 1.0
    audio_input: bool = False

    # dtype policy: params kept in param_dtype, compute in dtype, reductions f32.
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # Q-Former compression compute dtype.  bf16 matches the reference's fp16
    # compressor (tdc/builder.py:69) with f32 normalization/reductions kept
    # (cambrian_arch.py:1664-1667); measured drift vs f32 on oracle fixtures:
    # max rel 0.17%, min token cosine 0.9998 (PERF.md round 2).
    compress_dtype: Any = jnp.bfloat16

    def with_audio(self) -> "TDCConfig":
        return _replace(
            self,
            audio_input=True,
            compression=_replace(self.compression, audio_input=True),
        )

    @property
    def image_token_len(self) -> int:
        return self.sva.image_token_len

    def tokens_per_frame(self) -> int:
        """Amortized LLM tokens per video frame (reference hardcodes 144/50 at
        cambrian_arch.py:760-770; derived here from the configured SVA grid
        so non-144 video grids budget correctly)."""
        k = self.compression.context_token_num
        n = self.compression.chunk_size
        if not self.compression.add_static:
            return k
        static = self.sva.image_token_len + (50 if self.audio_input else 0)
        return (static + k * (n - 1)) // n


def tdc_qwen2_7b(audio: bool = False) -> TDCConfig:
    """Video flagship (TDC-Qwen2-7B): 144-token SVA grid."""
    cfg = TDCConfig(
        lm=QWEN2_7B,
        sva=SVA_VIDEO,
        qformer=_replace(QFORMER_BASE, encoder_width=QWEN2_7B.hidden_size),
        conv_version="qwen",
    )
    return cfg.with_audio() if audio else cfg


def tdc_llama32_3b(audio: bool = False) -> TDCConfig:
    cfg = TDCConfig(
        lm=LLAMA32_3B,
        sva=SVA_VIDEO,
        qformer=_replace(QFORMER_BASE, encoder_width=LLAMA32_3B.hidden_size),
        conv_version="llama3_2",
    )
    return cfg.with_audio() if audio else cfg


def tdc_qwen2_7b_stage1(audio: bool = False) -> TDCConfig:
    """Stage-1 image alignment config: 576-token grid
    (scripts/stage1/train_image_qwen.sh:46-51)."""
    cfg = TDCConfig(
        lm=QWEN2_7B,
        sva=SVA_DEFAULT,
        qformer=_replace(QFORMER_BASE, encoder_width=QWEN2_7B.hidden_size),
        conv_version="qwen",
    )
    return cfg.with_audio() if audio else cfg


def tdc_tiny(audio: bool = False) -> TDCConfig:
    """Tiny end-to-end config for tests: every module present, toy sizes."""
    cfg = TDCConfig(
        lm=LM_TINY,
        siglip=VIT_TINY,
        dino=VIT_TINY_DINO,
        qformer=_replace(QFORMER_TINY, encoder_width=LM_TINY.hidden_size, query_length=4),
        beats=BEATS_TINY,
        sva=SVA_TINY,
        compression=CompressionConfig(
            context_token_num=4,
            max_num_segments=4,
            chunk_size=4,
            max_train_frames=16,
            max_eval_frames=16,
        ),
        tokenizer_model_max_length=512,
        dtype=jnp.float32,
    )
    return cfg.with_audio() if audio else cfg


def save_config(cfg: TDCConfig, path: str) -> None:
    def enc(o):
        if dataclasses.is_dataclass(o) and not isinstance(o, type):
            return {k: enc(v) for k, v in dataclasses.asdict(o).items()}
        if o in (jnp.bfloat16, jnp.float32, jnp.float16):
            return jnp.dtype(o).name
        return o

    d = {f.name: enc(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    with open(path, "w") as fh:
        json.dump(d, fh, indent=2, default=str)


def load_config(path: str) -> TDCConfig:
    with open(path) as fh:
        d = json.load(fh)

    def mk(cls, dd):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in dd.items():
            if k not in fields:
                continue
            if isinstance(v, list):
                v = tuple(v)
            kw[k] = v
        return cls(**kw)

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}
    return TDCConfig(
        lm=mk(LMConfig, d["lm"]),
        siglip=mk(ViTConfig, d["siglip"]),
        dino=mk(ViTConfig, d["dino"]),
        qformer=mk(QFormerConfig, d["qformer"]),
        beats=mk(BeatsConfig, d["beats"]),
        sva=mk(SVAConfig, d["sva"]),
        compression=mk(CompressionConfig, d["compression"]),
        conv_version=d.get("conv_version", "qwen"),
        tokenizer_model_max_length=d.get("tokenizer_model_max_length", 8192),
        inference_max_length=d.get("inference_max_length", 16),
        video_fps=d.get("video_fps", 1.0),
        audio_input=d.get("audio_input", False),
        dtype=dtype.get(str(d.get("dtype", "bfloat16")), jnp.bfloat16),
        param_dtype=dtype.get(str(d.get("param_dtype", "float32")), jnp.float32),
    )
