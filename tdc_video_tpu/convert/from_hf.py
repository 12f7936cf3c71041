"""Convert HuggingFace / torch checkpoints to this framework's param pytrees.

The reference loads five torch checkpoint families (SURVEY.md section 7 "weight
conversion fidelity"): Qwen2/Llama LLM, SigLIP, DINOv2, BEATs, and the BERT
Q-Former (plus extras: query_proj / vision_proj / frame_seg / image_newline /
vision_query / SVA samplers / projectors).  Each converter below maps a flat
``state_dict`` (name -> numpy array) into our stacked-layer pytrees.

Torch is only imported lazily (CPU wheel, used as a checkpoint reader —
never on the compute path).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..config import BeatsConfig, LMConfig, QFormerConfig, ViTConfig


Array = np.ndarray
StateDict = Mapping[str, Array]


def _is_safetensors(path: str) -> bool:
    """Content sniff, not extension: a safetensors file opens with a u64
    little-endian header length followed by a JSON header.  The reference's
    mm_projector.bin name is a torch pickle there but may be safetensors
    when produced by our exporters."""
    if path.endswith(".safetensors"):
        return True
    try:
        with open(path, "rb") as fh:
            head = fh.read(9)
        n = int.from_bytes(head[:8], "little")
        return len(head) == 9 and 0 < n < 100_000_000 and head[8:9] in (b"{", b" ")
    except OSError:
        return False


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Read a .bin/.pt/.safetensors checkpoint into numpy arrays."""
    if _is_safetensors(path):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]  # BEATs checkpoints nest under "model"
    return {k: v.to(torch.float32).numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _lin(sd: StateDict, prefix: str, bias: bool = True) -> Dict[str, Array]:
    p = {"w": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if bias and prefix + ".bias" in sd:
        p["b"] = sd[prefix + ".bias"]
    return p


def _stack(trees):
    """Stack a list of identical pytrees along a new leading axis."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *trees)


# ---------------------------------------------------------------------------
# LLM (Qwen2 / Llama): HF "model.layers.N.*" layout
# ---------------------------------------------------------------------------


def convert_lm(sd: StateDict, cfg: LMConfig, prefix: str = "model.") -> Dict[str, Any]:
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{prefix}layers.{i}."
        layers.append(
            {
                "input_norm": {"scale": sd[lp + "input_layernorm.weight"]},
                "q_proj": _lin(sd, lp + "self_attn.q_proj"),
                "k_proj": _lin(sd, lp + "self_attn.k_proj"),
                "v_proj": _lin(sd, lp + "self_attn.v_proj"),
                "o_proj": _lin(sd, lp + "self_attn.o_proj", bias=False),
                "post_attn_norm": {"scale": sd[lp + "post_attention_layernorm.weight"]},
                "mlp": {
                    "gate": _lin(sd, lp + "mlp.gate_proj", bias=False),
                    "up": _lin(sd, lp + "mlp.up_proj", bias=False),
                    "down": _lin(sd, lp + "mlp.down_proj", bias=False),
                },
            }
        )
    params = {
        "embed": {"embedding": sd[prefix + "embed_tokens.weight"]},
        "layers": _stack(layers),
        "final_norm": {"scale": sd[prefix + "norm.weight"]},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": np.ascontiguousarray(sd["lm_head.weight"].T)}
    return params


# ---------------------------------------------------------------------------
# SigLIP vision tower: HF "vision_model.*" layout
# ---------------------------------------------------------------------------


def convert_siglip(sd: StateDict, cfg: ViTConfig, prefix: str = "vision_model.") -> Dict[str, Any]:
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layers.{i}."
        layers.append(
            {
                "norm1": {
                    "scale": sd[lp + "layer_norm1.weight"],
                    "bias": sd[lp + "layer_norm1.bias"],
                },
                "q_proj": _lin(sd, lp + "self_attn.q_proj"),
                "k_proj": _lin(sd, lp + "self_attn.k_proj"),
                "v_proj": _lin(sd, lp + "self_attn.v_proj"),
                "o_proj": _lin(sd, lp + "self_attn.out_proj"),
                "norm2": {
                    "scale": sd[lp + "layer_norm2.weight"],
                    "bias": sd[lp + "layer_norm2.bias"],
                },
                "mlp": {
                    "fc1": _lin(sd, lp + "mlp.fc1"),
                    "fc2": _lin(sd, lp + "mlp.fc2"),
                },
            }
        )
    # HF conv patch embed: [H, 3, P, P] -> dense [P*P*3, H] on flattened patches.
    conv_w = sd[prefix + "embeddings.patch_embedding.weight"]
    h, c, p, _ = conv_w.shape
    patch_w = conv_w.transpose(2, 3, 1, 0).reshape(p * p * c, h)
    return {
        "patch_embed": {"w": patch_w, "b": sd[prefix + "embeddings.patch_embedding.bias"]},
        "pos_embed": sd[prefix + "embeddings.position_embedding.weight"],
        "layers": _stack(layers),
        "final_norm": {
            "scale": sd[prefix + "post_layernorm.weight"],
            "bias": sd[prefix + "post_layernorm.bias"],
        },
    }


# ---------------------------------------------------------------------------
# DINOv2 tower: HF "embeddings/encoder.layer.N" layout
# ---------------------------------------------------------------------------


def convert_dinov2(sd: StateDict, cfg: ViTConfig, prefix: str = "") -> Dict[str, Any]:
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layer.{i}."
        layer = {
            "norm1": {"scale": sd[lp + "norm1.weight"], "bias": sd[lp + "norm1.bias"]},
            "q_proj": _lin(sd, lp + "attention.attention.query"),
            "k_proj": _lin(sd, lp + "attention.attention.key"),
            "v_proj": _lin(sd, lp + "attention.attention.value"),
            "o_proj": _lin(sd, lp + "attention.output.dense"),
            "norm2": {"scale": sd[lp + "norm2.weight"], "bias": sd[lp + "norm2.bias"]},
            "ls1": sd[lp + "layer_scale1.lambda1"],
            "ls2": sd[lp + "layer_scale2.lambda1"],
        }
        if cfg.use_swiglu:
            layer["mlp"] = {
                "gate_up": _lin(sd, lp + "mlp.weights_in"),
                "down": _lin(sd, lp + "mlp.weights_out"),
            }
        else:
            layer["mlp"] = {
                "fc1": _lin(sd, lp + "mlp.fc1"),
                "fc2": _lin(sd, lp + "mlp.fc2"),
            }
        layers.append(layer)
    conv_w = sd[prefix + "embeddings.patch_embeddings.projection.weight"]
    h, c, p, _ = conv_w.shape
    patch_w = conv_w.transpose(2, 3, 1, 0).reshape(p * p * c, h)
    return {
        "patch_embed": {
            "w": patch_w,
            "b": sd[prefix + "embeddings.patch_embeddings.projection.bias"],
        },
        # HF stores [1, 1, H]; our init_vit tree holds a flat [H] vector
        # (models/vit.py:82) — anything else breaks export/import bijection
        "cls_token": np.asarray(sd[prefix + "embeddings.cls_token"]).reshape(-1),
        "pos_embed": sd[prefix + "embeddings.position_embeddings"][0],
        "layers": _stack(layers),
        "final_norm": {
            "scale": sd[prefix + "layernorm.weight"],
            "bias": sd[prefix + "layernorm.bias"],
        },
    }


# ---------------------------------------------------------------------------
# BERT Q-Former: reference tdc/Qformer.py ("bert.encoder.layer.N" layout)
# ---------------------------------------------------------------------------


def convert_qformer(sd: StateDict, cfg: QFormerConfig, prefix: str = "bert.") -> Dict[str, Any]:
    def attn(lp: str, kind: str) -> Dict[str, Any]:
        ap = f"{lp}{kind}."
        out = "output." if kind == "attention" else "output."
        return {
            "q_proj": _lin(sd, ap + "self.query"),
            "k_proj": _lin(sd, ap + "self.key"),
            "v_proj": _lin(sd, ap + "self.value"),
            "o_proj": _lin(sd, ap + out + "dense"),
            "norm": {
                "scale": sd[ap + out + "LayerNorm.weight"],
                "bias": sd[ap + out + "LayerNorm.bias"],
            },
        }

    layers = []
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layer.{i}."
        layer = {"self_attn": attn(lp, "attention")}
        if i % cfg.cross_attention_freq == 0:
            layer["cross_attn"] = attn(lp, "crossattention")
        else:  # keep the scan-stacked tree homogeneous; zeros are never used
            layer["cross_attn"] = None
        layer["ffn"] = {
            "fc1": _lin(sd, lp + "intermediate.dense"),
            "fc2": _lin(sd, lp + "output.dense"),
            "norm": {
                "scale": sd[lp + "output.LayerNorm.weight"],
                "bias": sd[lp + "output.LayerNorm.bias"],
            },
        }
        layer["ffn_query"] = {
            "fc1": _lin(sd, lp + "intermediate_query.dense"),
            "fc2": _lin(sd, lp + "output_query.dense"),
            "norm": {
                "scale": sd[lp + "output_query.LayerNorm.weight"],
                "bias": sd[lp + "output_query.LayerNorm.bias"],
            },
        }
        layers.append(layer)

    return {
        "embeddings": {
            "word": sd[prefix + "embeddings.word_embeddings.weight"],
            "position": sd[prefix + "embeddings.position_embeddings.weight"],
            "norm": {
                "scale": sd[prefix + "embeddings.LayerNorm.weight"],
                "bias": sd[prefix + "embeddings.LayerNorm.bias"],
            },
        },
        "layers": layers,  # list (cross layers differ) — consumed without scan
    }


# ---------------------------------------------------------------------------
# BEATs: fairseq-style checkpoint (reference tdc/audio_models/beats)
# ---------------------------------------------------------------------------


def convert_beats(sd: StateDict, cfg: BeatsConfig, prefix: str = "") -> Dict[str, Any]:
    """Map a BEATs checkpoint (BEATs_iter3_plus_AS2M*.pt, nested under "model")
    into models/beats.py's tree.  The weight-normed pos_conv
    (backbone.py:44: weight_norm dim=2 -> g [1,1,K], v [O,I/G,K]) is folded
    into a plain conv weight."""
    # patch conv [512, 1, 16, 16] -> dense [256, 512] over (kh, kw) patches
    conv_w = sd[prefix + "patch_embedding.weight"]
    o, _, p, _ = conv_w.shape
    patch = {"w": conv_w.transpose(2, 3, 1, 0).reshape(p * p, o)}
    if prefix + "patch_embedding.bias" in sd:
        patch["b"] = sd[prefix + "patch_embedding.bias"]

    g = sd[prefix + "encoder.pos_conv.0.weight_g"]
    v = sd[prefix + "encoder.pos_conv.0.weight_v"]
    norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
    pos_w = (g / np.maximum(norm, 1e-12)) * v  # [O, I/G, K]

    def ln(name):
        return {"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]}

    layers = []
    rel_bias = sd[prefix + "encoder.layers.0.self_attn.relative_attention_bias.weight"]
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layers.{i}."
        layers.append(
            {
                "q_proj": _lin(sd, lp + "self_attn.q_proj"),
                "k_proj": _lin(sd, lp + "self_attn.k_proj"),
                "v_proj": _lin(sd, lp + "self_attn.v_proj"),
                "o_proj": _lin(sd, lp + "self_attn.out_proj"),
                "attn_norm": ln(lp + "self_attn_layer_norm"),
                "fc1": _lin(sd, lp + "fc1"),
                "fc2": _lin(sd, lp + "fc2"),
                "final_norm": ln(lp + "final_layer_norm"),
                "grep_linear": _lin(sd, lp + "self_attn.grep_linear"),
                "grep_a": sd[lp + "self_attn.grep_a"].reshape(-1),
            }
        )
    return {
        "patch_embed": patch,
        "patch_norm": ln(prefix + "layer_norm"),
        "post_extract_proj": _lin(sd, prefix + "post_extract_proj"),
        "pos_conv": {"w": pos_w, "b": sd[prefix + "encoder.pos_conv.0.bias"]},
        "encoder_norm": ln(prefix + "encoder.layer_norm"),
        "rel_pos_bias": rel_bias,
        "layers": _stack(layers),
    }


# ---------------------------------------------------------------------------
# SVA connector + compressor extras from a trained TDC checkpoint
# (key names from tdc/cambrian_arch.py:47-163 + vision_sampler.py:305-566)
# ---------------------------------------------------------------------------


def _ln_lin(sd: StateDict, prefix: str) -> Dict[str, Any]:
    """nn.Sequential(LayerNorm, Linear) as in CrossAttention q/k/v
    (vision_sampler.py:75-86)."""
    return {
        "norm": {"scale": sd[prefix + ".0.weight"], "bias": sd[prefix + ".0.bias"]},
        "lin": _lin(sd, prefix + ".1", bias=False),
    }


def convert_sva(sd: StateDict, num_towers: int, num_groups: int, depth: int,
                prefix: str = "model.") -> Dict[str, Any]:
    params: Dict[str, Any] = {"aux_projectors": [], "samplers": []}
    for t in range(num_towers):
        ap = f"{prefix}mm_projector_aux_{t}."
        params["aux_projectors"].append(
            {
                "fc1": _lin(sd, ap + "0"),
                "fc2": _lin(sd, ap + "2"),
                "norm": {"scale": sd[ap + "3.weight"], "bias": sd[ap + "3.bias"]},
            }
        )
    for gi in range(num_groups):
        layers = []
        for li in range(depth):
            lp = f"{prefix}vision_sampler_{gi}.layers.{li}."
            layer = {
                "proj_context": _lin(sd, lp + "proj_context", bias=False),
                "proj_in": _lin(sd, lp + "proj_in", bias=False),
                "q_proj": _ln_lin(sd, lp + "cross_attn.q_proj"),
                "o_proj": _lin(sd, lp + "cross_attn.o_proj", bias=False),
                "norm": {"scale": sd[lp + "norm.weight"], "bias": sd[lp + "norm.bias"]},
                "proj_out": {
                    "fc1": _lin(sd, lp + "proj_out.linear_1", bias=False),
                    "fc2": _lin(sd, lp + "proj_out.linear_2", bias=False),
                },
                "kv": [
                    {
                        "k_proj": _ln_lin(sd, lp + f"cross_attn.k_proj_{t}"),
                        "v_proj": _ln_lin(sd, lp + f"cross_attn.v_proj_{t}"),
                    }
                    for t in range(num_towers)
                ],
                "pos_embed": [
                    sd.get(lp + f"pos_embed_{t}") for t in range(num_towers)
                ],
            }
            layers.append(layer)
        params["samplers"].append({"layers": layers})
    params["vision_query"] = sd[prefix + "vision_query"]
    params["mm_projector"] = {
        "fc1": _lin(sd, prefix + "mm_projector.0"),
        "fc2": _lin(sd, prefix + "mm_projector.2"),
    }
    return params


def convert_compressor(sd: StateDict, cfg: QFormerConfig, prefix: str = "model.") -> Dict[str, Any]:
    """Q-Former + projections + frame separator (initialize_compressor,
    cambrian_arch.py:469-486)."""
    return {
        "qformer": convert_qformer(sd, cfg, prefix=prefix + "Qformer.bert."),
        "query_proj": _lin(sd, prefix + "query_proj"),
        "vision_proj": _lin(sd, prefix + "vision_proj"),
        "query_tokens": sd[prefix + "query_tokens"][0],
        "frame_seg": sd[prefix + "frame_seg"],
    }


def convert_tdc(sd: StateDict, cfg, prefix: str = "model.") -> Dict[str, Any]:
    """Full TDC-Video checkpoint (CambrianQwen/LlamaForCausalLM state dict) ->
    model.init_tdc tree.  `cfg` is a config.TDCConfig."""
    params: Dict[str, Any] = {
        "lm": convert_lm(sd, cfg.lm, prefix=prefix),
        "siglip": convert_siglip(
            sd, cfg.siglip,
            prefix=prefix + "vision_tower_aux_list.0.vision_tower.vision_model.",
        ),
        "dino": convert_dinov2(
            sd, cfg.dino, prefix=prefix + "vision_tower_aux_list.1.vision_tower.",
        ),
        "sva": convert_sva(
            sd,
            num_towers=2,
            num_groups=cfg.sva.num_query_group,
            depth=cfg.sva.connector_depth,
            prefix=prefix,
        ),
        "compressor": convert_compressor(sd, cfg.qformer, prefix=prefix),
        "image_newline": sd[prefix + "image_newline"],
    }
    if prefix + "audio_proj.weight" in sd:
        params["audio_proj"] = _lin(sd, prefix + "audio_proj")
    beats_prefix = prefix + "audio_encoder.beats."
    if beats_prefix + "patch_embedding.weight" in sd:
        params["beats"] = convert_beats(sd, cfg.beats, prefix=beats_prefix)
    return params
