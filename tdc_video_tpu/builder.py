"""Model loading: reference-format checkpoints -> (tokenizer, model bundle).

Replaces tdc/builder.py:40-264 (load_pretrained_model): reads a TDC-Video HF
checkpoint directory (config.json + safetensors/bin shards), maps the torch
state dict into our param tree (convert/from_hf.py), and handles the three
loading flavors:

* plain cambrian model (reference :167-178);
* LoRA: base model + adapter_model deltas merged as W += B @ A * (alpha/r)
  + non_lora_trainables overrides (reference :81-150);
* projector-only adapters (mm_projector.bin on a base model, :151-166).

Quantized (4/8-bit bnb) paths are GPU-idiomatic and intentionally dropped;
bf16 on TPU is the served dtype.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import replace
from typing import Any, Dict, Optional, Tuple

import numpy as np

from . import config as C
from .convert import from_hf


def read_config(model_path: str) -> C.TDCConfig:
    """Build a TDCConfig from a reference-style HF config.json (the attribute
    soup persisted by tdc/train.py:1123-1135)."""
    with open(os.path.join(model_path, "config.json")) as fh:
        hf = json.load(fh)
    model_type = hf.get("model_type", "")
    arch = " ".join(hf.get("architectures", []))
    is_llama = "llama" in (model_type + arch).lower()
    cfg = C.tdc_llama32_3b() if is_llama else C.tdc_qwen2_7b()

    lm = replace(
        cfg.lm,
        vocab_size=hf.get("vocab_size", cfg.lm.vocab_size),
        hidden_size=hf.get("hidden_size", cfg.lm.hidden_size),
        num_layers=hf.get("num_hidden_layers", cfg.lm.num_layers),
        num_heads=hf.get("num_attention_heads", cfg.lm.num_heads),
        num_kv_heads=hf.get("num_key_value_heads", cfg.lm.num_kv_heads),
        intermediate_size=hf.get("intermediate_size", cfg.lm.intermediate_size),
        rope_theta=hf.get("rope_theta", cfg.lm.rope_theta),
        rms_norm_eps=hf.get("rms_norm_eps", cfg.lm.rms_norm_eps),
        max_position_embeddings=hf.get(
            "max_position_embeddings", cfg.lm.max_position_embeddings
        ),
        tie_word_embeddings=hf.get("tie_word_embeddings", cfg.lm.tie_word_embeddings),
    )
    comp = replace(
        cfg.compression,
        context_token_num=hf.get("context_token_num", 16),
        query_type=hf.get("query_type", "Avg_pool"),
        add_static=hf.get("add_static", True),
        text_input=hf.get("text_input", True),
        max_num_segments=hf.get("max_num_segments", 24),
        audio_input=hf.get("audio_input", False),
        frame_pos=hf.get("frame_pos", False),
        is_image_newline=hf.get("is_image_newline", True),
    )
    image_token_len = hf.get("image_token_len", 144)
    query_num_list = hf.get("query_num_list", [image_token_len])
    if isinstance(query_num_list, str):
        query_num_list = json.loads(query_num_list)
    sva = replace(
        cfg.sva,
        image_token_len=image_token_len,
        query_num_list=tuple(query_num_list),
        vision_hidden_size=hf.get("vision_hidden_size", 1024),
        num_query_group=hf.get("num_query_group", 1),
        connector_depth=hf.get("connector_depth", 3),
    )
    qf = replace(cfg.qformer, encoder_width=lm.hidden_size)
    cfg = replace(
        cfg,
        lm=lm,
        compression=comp,
        sva=sva,
        qformer=qf,
        audio_input=hf.get("audio_input", False),
        tokenizer_model_max_length=hf.get("tokenizer_model_max_length", 8192),
        conv_version="llama3_2" if is_llama else "qwen",
    )
    # Our own extension (absent from reference checkpoints): nested dataclass
    # overrides, e.g. tiny tower dims for test fixtures.
    overrides = hf.get("tdc_tpu_overrides")
    if overrides:
        for section, vals in overrides.items():
            sub = getattr(cfg, section)
            vals = {
                k: tuple(v) if isinstance(v, list) else v for k, v in vals.items()
            }
            cfg = replace(cfg, **{section: replace(sub, **vals)})
    return cfg


def load_state_dict(model_path: str) -> Dict[str, np.ndarray]:
    """Merge every weight shard in the directory (safetensors preferred)."""
    sd: Dict[str, np.ndarray] = {}
    shards = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not shards:
        shards = sorted(glob.glob(os.path.join(model_path, "pytorch_model*.bin")))
    if not shards:
        raise FileNotFoundError(f"no weight shards in {model_path}")
    for s in shards:
        sd.update(from_hf.load_torch_state_dict(s))
    return sd


def merge_lora(
    sd: Dict[str, np.ndarray],
    adapter_sd: Dict[str, np.ndarray],
    scaling: Optional[float] = None,
    adapter_config: Optional[dict] = None,
) -> Dict[str, np.ndarray]:
    """Merge peft LoRA deltas into the base state dict
    (reference merge path: tdc/builder.py:114-150 via peft merge_and_unload).

    peft keys: base_model.model.<module>.lora_A.weight [r, in] and
    lora_B.weight [out, r]; merged W += B @ A * (lora_alpha / r).
    """
    if scaling is None:
        if adapter_config is None:
            raise ValueError("need scaling or adapter_config")
        scaling = adapter_config["lora_alpha"] / adapter_config["r"]
    out = dict(sd)
    for k, a in adapter_sd.items():
        if ".lora_A." not in k:
            continue
        kb = k.replace(".lora_A.", ".lora_B.")
        b = adapter_sd[kb]
        base_key = (
            k.replace("base_model.model.", "")
            .replace(".lora_A.weight", ".weight")
            .replace(".lora_A.default.weight", ".weight")
        )
        if base_key not in out:
            raise KeyError(f"LoRA target {base_key} missing from base state dict")
        out[base_key] = out[base_key] + (b @ a) * scaling
    # non-LoRA trainables (frame_seg, sampler pos embeds, Qformer, ...)
    for k, v in adapter_sd.items():
        if ".lora_A." in k or ".lora_B." in k:
            continue
        out[k.replace("base_model.model.", "")] = v
    return out


class TDCModel:
    """Loaded model bundle: config + params (+ jitted entry points on demand)."""

    def __init__(self, cfg: C.TDCConfig, params: Any):
        self.cfg = cfg
        self.params = params

    def generate(self, *args, **kw):
        from .serving.generate import generate

        return generate(self.cfg, self.params, *args, **kw)

    def loss(self, batch, **kw):
        from .model import tdc_loss

        return tdc_loss(self.cfg, self.params, batch, **kw)


def load_pretrained_model(
    model_path: str,
    model_base: Optional[str] = None,
    model_name: Optional[str] = None,
    dtype=None,
    load_tokenizer: bool = True,
    quantize: Optional[str] = None,  # "int8": weight-only int8 LM; "int8-all": + int8-compute towers
    calib_pixels: Optional[Tuple[Any, Any]] = None,  # (siglip_px, dino_px) for static W8A8 act scales
) -> Tuple[Any, TDCModel, list, int]:
    """Reference-compatible loader signature (tdc/builder.py:40-51): returns
    (tokenizer, model, image_preprocess_list, context_len).

    quantize="int8" replaces the reference's CUDA-only bitsandbytes 4/8-bit
    options (tdc/builder.py:58-67) with TPU-native weight-only int8 on the
    LM (models/quant.py) — ~2x the decode roofline.  quantize="int8-all"
    additionally quantizes the SigLIP/DINOv2 towers for int8 MXU compute
    (~2x bf16 encode throughput; drift bounds in tests/test_quant.py).
    Passing calib_pixels=(siglip_batch, dino_batch) with "int8-all" runs the
    float towers once on that batch to calibrate static per-layer activation
    scales (models/quant.calibrate_vit_act_scales): the serving fast path
    that removes the dynamic per-token amax pass (PERF.md round 3)."""
    import jax.numpy as jnp

    model_name = model_name or os.path.basename(model_path)
    cfg = read_config(model_path)
    if dtype is not None:
        cfg = replace(cfg, dtype=dtype)

    if "lora" in (model_name or "").lower() and model_base is not None:
        base_sd = load_state_dict(model_base)
        adapter_sd = {}
        for f in ("adapter_model.safetensors", "adapter_model.bin"):
            p = os.path.join(model_path, f)
            if os.path.exists(p):
                adapter_sd.update(from_hf.load_torch_state_dict(p))
        nlt = os.path.join(model_path, "non_lora_trainables.bin")
        if os.path.exists(nlt):
            extra = from_hf.load_torch_state_dict(nlt)
            adapter_sd.update(
                {k: v for k, v in extra.items() if ".lora_" not in k}
            )
        with open(os.path.join(model_path, "adapter_config.json")) as fh:
            acfg = json.load(fh)
        sd = merge_lora(base_sd, adapter_sd, adapter_config=acfg)
    else:
        sd = load_state_dict(model_path)

    params = from_hf.convert_tdc(sd, cfg)
    # numpy -> device arrays in the param dtype (floats only)
    import jax

    params = jax.tree_util.tree_map(
        lambda x: (
            jnp.asarray(x, cfg.param_dtype)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else jnp.asarray(x)
        ),
        params,
    )

    if quantize in ("int8", "int8-all"):
        from .models.quant import (
            calibrate_vit_act_scales,
            quantize_lm_int8,
            quantize_vit_int8,
        )

        params["lm"] = quantize_lm_int8(params["lm"])
        if quantize == "int8-all":
            sc_s = sc_d = None
            if calib_pixels is not None:
                sig_px, dino_px = calib_pixels
                sc_s = calibrate_vit_act_scales(
                    cfg.siglip, params["siglip"], jnp.asarray(sig_px), dtype=cfg.dtype
                )
                sc_d = calibrate_vit_act_scales(
                    cfg.dino, params["dino"], jnp.asarray(dino_px), dtype=cfg.dtype
                )
            params["siglip"] = quantize_vit_int8(params["siglip"], act_scales=sc_s)
            params["dino"] = quantize_vit_int8(params["dino"], act_scales=sc_d)
    elif quantize not in (None, "none"):
        raise ValueError(f"unknown quantize mode {quantize!r}")

    tokenizer = None
    if load_tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=True)

    from .data.images import tower_preprocess_list

    context_len = cfg.tokenizer_model_max_length
    return tokenizer, TDCModel(cfg, params), tower_preprocess_list(cfg), context_len


def load_mm_adapter(params: Any, adapter_path: str, cfg: C.TDCConfig) -> Any:
    """Overlay an adapter-only artifact onto a base param tree (reference
    projector-only load path, tdc/builder.py:151-166)."""
    import jax
    import jax.numpy as jnp

    sd = from_hf.load_torch_state_dict(adapter_path)
    sva = from_hf.convert_sva(
        sd,
        num_towers=2,
        num_groups=cfg.sva.num_query_group,
        depth=cfg.sva.connector_depth,
        prefix="model.",
    )
    out = dict(params)
    out["sva"] = jax.tree_util.tree_map(lambda x: jnp.asarray(x, cfg.param_dtype), sva)
    if "model.image_newline" in sd:
        out["image_newline"] = jnp.asarray(sd["model.image_newline"], cfg.param_dtype)
    return out
