"""Full checkpoint round trip: a synthetic reference-format TDC checkpoint
directory (config.json + model.safetensors with the reference's exact key
layout, SURVEY.md section 2.1) loaded through builder.load_pretrained_model and
driven to generation."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from tdc_video_tpu.builder import load_pretrained_model, read_config
from tdc_video_tpu.config import tdc_tiny

from test_convert import _lin_sd, _ln_sd, _uniq, make_beats_sd, make_sva_sd


def make_lm_sd(cfg, make, prefix="model."):
    sd = {}
    H, F = cfg.hidden_size, cfg.intermediate_size
    sd[prefix + "embed_tokens.weight"] = make(cfg.vocab_size, H)
    for i in range(cfg.num_layers):
        lp = f"{prefix}layers.{i}."
        sd[lp + "input_layernorm.weight"] = make(H)
        # qwen2 ships qkv biases, llama does not (config.LMConfig)
        _lin_sd(sd, lp + "self_attn.q_proj", H, cfg.q_dim, make, bias=cfg.attention_bias)
        _lin_sd(sd, lp + "self_attn.k_proj", H, cfg.kv_dim, make, bias=cfg.attention_bias)
        _lin_sd(sd, lp + "self_attn.v_proj", H, cfg.kv_dim, make, bias=cfg.attention_bias)
        _lin_sd(sd, lp + "self_attn.o_proj", cfg.q_dim, H, make, bias=False)
        sd[lp + "post_attention_layernorm.weight"] = make(H)
        _lin_sd(sd, lp + "mlp.gate_proj", H, F, make, bias=False)
        _lin_sd(sd, lp + "mlp.up_proj", H, F, make, bias=False)
        _lin_sd(sd, lp + "mlp.down_proj", F, H, make, bias=False)
    sd[prefix + "norm.weight"] = make(H)
    if not cfg.tie_word_embeddings:
        sd["lm_head.weight"] = make(cfg.vocab_size, H)
    return sd


def make_vit_sd(cfg, make, prefix, style):
    sd = {}
    d, f = cfg.hidden_size, cfg.intermediate_size
    if style == "siglip":
        sd[prefix + "embeddings.patch_embedding.weight"] = make(d, 3, 14, 14)
        sd[prefix + "embeddings.patch_embedding.bias"] = make(d)
        sd[prefix + "embeddings.position_embedding.weight"] = make(cfg.num_patches, d)
        for i in range(cfg.num_layers):
            lp = f"{prefix}encoder.layers.{i}."
            _ln_sd(sd, lp + "layer_norm1", d, make)
            for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                _lin_sd(sd, lp + "self_attn." + n, d, d, make)
            _ln_sd(sd, lp + "layer_norm2", d, make)
            _lin_sd(sd, lp + "mlp.fc1", d, f, make)
            _lin_sd(sd, lp + "mlp.fc2", f, d, make)
        _ln_sd(sd, prefix + "post_layernorm", d, make)
    else:
        sd[prefix + "embeddings.patch_embeddings.projection.weight"] = make(d, 3, 14, 14)
        sd[prefix + "embeddings.patch_embeddings.projection.bias"] = make(d)
        sd[prefix + "embeddings.cls_token"] = make(1, 1, d)
        sd[prefix + "embeddings.position_embeddings"] = make(1, cfg.num_patches + 1, d)
        for i in range(cfg.num_layers):
            lp = f"{prefix}encoder.layer.{i}."
            _ln_sd(sd, lp + "norm1", d, make)
            _lin_sd(sd, lp + "attention.attention.query", d, d, make)
            _lin_sd(sd, lp + "attention.attention.key", d, d, make)
            _lin_sd(sd, lp + "attention.attention.value", d, d, make)
            _lin_sd(sd, lp + "attention.output.dense", d, d, make)
            _ln_sd(sd, lp + "norm2", d, make)
            sd[lp + "layer_scale1.lambda1"] = make(d)
            sd[lp + "layer_scale2.lambda1"] = make(d)
            _lin_sd(sd, lp + "mlp.weights_in", d, 2 * f, make)
            _lin_sd(sd, lp + "mlp.weights_out", f, d, make)
        _ln_sd(sd, prefix + "layernorm", d, make)
    return sd


def make_compressor_sd(cfg, make, prefix="model."):
    sd = {}
    qp = prefix + "Qformer.bert."
    d, f, E = cfg.hidden_size, cfg.intermediate_size, cfg.encoder_width
    sd[qp + "embeddings.word_embeddings.weight"] = make(cfg.vocab_size, d)
    sd[qp + "embeddings.position_embeddings.weight"] = make(cfg.max_position_embeddings, d)
    _ln_sd(sd, qp + "embeddings.LayerNorm", d, make)
    for i in range(cfg.num_layers):
        lp = f"{qp}encoder.layer.{i}."
        for kind, kv_dim in (("attention", d), ("crossattention", E)):
            if kind == "crossattention" and i % cfg.cross_attention_freq != 0:
                continue
            _lin_sd(sd, lp + kind + ".self.query", d, d, make)
            _lin_sd(sd, lp + kind + ".self.key", kv_dim, d, make)
            _lin_sd(sd, lp + kind + ".self.value", kv_dim, d, make)
            _lin_sd(sd, lp + kind + ".output.dense", d, d, make)
            _ln_sd(sd, lp + kind + ".output.LayerNorm", d, make)
        for q in ("", "_query"):
            _lin_sd(sd, lp + f"intermediate{q}.dense", d, f, make)
            _lin_sd(sd, lp + f"output{q}.dense", f, d, make)
            _ln_sd(sd, lp + f"output{q}.LayerNorm", d, make)
    _lin_sd(sd, prefix + "query_proj", E, d, make)
    _lin_sd(sd, prefix + "vision_proj", d, E, make)
    sd[prefix + "query_tokens"] = make(1, cfg.query_length, d)
    sd[prefix + "frame_seg"] = make(E)
    return sd


def write_checkpoint(path, cfg, audio=False):
    """Write a tiny reference-format checkpoint dir for `cfg` (tdc_tiny)."""
    from safetensors.numpy import save_file

    make = _uniq()
    sd = {}
    sd.update(make_lm_sd(cfg.lm, make))
    sd.update(
        make_vit_sd(
            cfg.siglip, make,
            "model.vision_tower_aux_list.0.vision_tower.vision_model.", "siglip",
        )
    )
    sd.update(
        make_vit_sd(cfg.dino, make, "model.vision_tower_aux_list.1.vision_tower.", "dino")
    )
    # SVA for tiny dims: towers 32/48 -> vision_hidden 32 -> llm 64
    sva_sd = {}
    m2 = _uniq()
    d = cfg.sva.vision_hidden_size
    tower_dims = (cfg.siglip.hidden_size, cfg.dino.hidden_size)
    for t, td in enumerate(tower_dims):
        ap = f"model.mm_projector_aux_{t}."
        _lin_sd(sva_sd, ap + "0", td, d, m2)
        _lin_sd(sva_sd, ap + "2", d, d, m2)
        _ln_sd(sva_sd, ap + "3", d, m2)
    rf = int(cfg.sva.tower_token_len_list[0] ** 0.5) // int(cfg.sva.query_num_list[0] ** 0.5)
    for li in range(cfg.sva.connector_depth):
        lp = f"model.vision_sampler_0.layers.{li}."
        _lin_sd(sva_sd, lp + "proj_context", d, d, m2, bias=False)
        _lin_sd(sva_sd, lp + "proj_in", 2 * d, d, m2, bias=False)
        _ln_sd(sva_sd, lp + "cross_attn.q_proj.0", d, m2)
        _lin_sd(sva_sd, lp + "cross_attn.q_proj.1", d, d, m2, bias=False)
        for t in range(2):
            _ln_sd(sva_sd, lp + f"cross_attn.k_proj_{t}.0", d, m2)
            _lin_sd(sva_sd, lp + f"cross_attn.k_proj_{t}.1", d, d, m2, bias=False)
            _ln_sd(sva_sd, lp + f"cross_attn.v_proj_{t}.0", d, m2)
            _lin_sd(sva_sd, lp + f"cross_attn.v_proj_{t}.1", d, d, m2, bias=False)
            if rf > 1:
                sva_sd[lp + f"pos_embed_{t}"] = m2(rf * rf, d)
        _lin_sd(sva_sd, lp + "cross_attn.o_proj", d, d, m2, bias=False)
        _ln_sd(sva_sd, lp + "norm", d, m2)
        _lin_sd(sva_sd, lp + "proj_out.linear_1", d, d, m2, bias=False)
        _lin_sd(sva_sd, lp + "proj_out.linear_2", d, d, m2, bias=False)
    sva_sd["model.vision_query"] = m2(1, d)
    _lin_sd(sva_sd, "model.mm_projector.0", d, cfg.lm.hidden_size, m2)
    _lin_sd(sva_sd, "model.mm_projector.2", cfg.lm.hidden_size, cfg.lm.hidden_size, m2)
    sd.update(sva_sd)
    sd.update(make_compressor_sd(cfg.qformer, make))
    sd["model.image_newline"] = make(cfg.lm.hidden_size)
    if audio:
        sd.update(make_beats_sd(cfg.beats, prefix="model.audio_encoder.beats."))
        _lin_sd(sd, "model.audio_proj", cfg.beats.encoder_embed_dim, cfg.lm.hidden_size, make)

    os.makedirs(path, exist_ok=True)
    save_file(sd, os.path.join(path, "model.safetensors"))
    is_llama = cfg.lm.name != "qwen2"
    hf_cfg = {
        "model_type": "cambrian_llama" if is_llama else "cambrian_qwen",
        "architectures": [
            "CambrianLlamaForCausalLM" if is_llama else "CambrianQwenForCausalLM"
        ],
        "tie_word_embeddings": cfg.lm.tie_word_embeddings,
        "vocab_size": cfg.lm.vocab_size,
        "hidden_size": cfg.lm.hidden_size,
        "num_hidden_layers": cfg.lm.num_layers,
        "num_attention_heads": cfg.lm.num_heads,
        "num_key_value_heads": cfg.lm.num_kv_heads,
        "intermediate_size": cfg.lm.intermediate_size,
        "context_token_num": cfg.compression.context_token_num,
        "image_token_len": cfg.sva.image_token_len,
        "query_num_list": list(cfg.sva.query_num_list),
        "vision_hidden_size": cfg.sva.vision_hidden_size,
        "connector_depth": cfg.sva.connector_depth,
        "audio_input": audio,
        "tokenizer_model_max_length": 512,
        "tdc_tpu_overrides": {
            "lm": {
                "head_dim": cfg.lm.head_dim,
                "rope_theta": cfg.lm.rope_theta,
                "rope_scaling": (
                    list(cfg.lm.rope_scaling) if cfg.lm.rope_scaling else None
                ),
                "attention_bias": cfg.lm.attention_bias,
                "pad_token_id": cfg.lm.pad_token_id,
                "eos_token_ids": list(cfg.lm.eos_token_ids),
                "max_position_embeddings": cfg.lm.max_position_embeddings,
            },
            "siglip": {
                "image_size": cfg.siglip.image_size,
                "hidden_size": cfg.siglip.hidden_size,
                "num_layers": cfg.siglip.num_layers,
                "num_heads": cfg.siglip.num_heads,
                "intermediate_size": cfg.siglip.intermediate_size,
                "interp_tokens": cfg.siglip.interp_tokens,
            },
            "dino": {
                "image_size": cfg.dino.image_size,
                "hidden_size": cfg.dino.hidden_size,
                "num_layers": cfg.dino.num_layers,
                "num_heads": cfg.dino.num_heads,
                "intermediate_size": cfg.dino.intermediate_size,
                "interp_tokens": cfg.dino.interp_tokens,
                "use_cls_token": True,
                "use_swiglu": True,
                "layerscale": True,
            },
            "qformer": {
                "vocab_size": cfg.qformer.vocab_size,
                "hidden_size": cfg.qformer.hidden_size,
                "num_layers": cfg.qformer.num_layers,
                "num_heads": cfg.qformer.num_heads,
                "intermediate_size": cfg.qformer.intermediate_size,
                "max_position_embeddings": cfg.qformer.max_position_embeddings,
                "query_length": cfg.qformer.query_length,
            },
            "beats": {
                "embed_dim": cfg.beats.embed_dim,
                "encoder_embed_dim": cfg.beats.encoder_embed_dim,
                "num_layers": cfg.beats.num_layers,
                "num_heads": cfg.beats.num_heads,
                "ffn_dim": cfg.beats.ffn_dim,
                "num_buckets": cfg.beats.num_buckets,
                "max_distance": cfg.beats.max_distance,
            },
            "sva": {
                "tower_token_len_list": list(cfg.sva.tower_token_len_list),
            },
        },
    }
    with open(os.path.join(path, "config.json"), "w") as fh:
        json.dump(hf_cfg, fh)
    return sd


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = tdc_tiny()
    path = str(tmp_path_factory.mktemp("ckpt") / "tdc-tiny")
    sd = write_checkpoint(path, cfg, audio=True)
    return path, cfg, sd


class TestBuilder:
    def test_read_config(self, ckpt):
        path, cfg, _ = ckpt
        rc = read_config(path)
        assert rc.lm.hidden_size == cfg.lm.hidden_size
        assert rc.compression.context_token_num == cfg.compression.context_token_num
        assert rc.audio_input
        assert rc.conv_version == "qwen"

    def test_load_and_generate(self, ckpt):
        path, cfg, sd = ckpt
        tok, model, preprocess_list, ctx_len = load_pretrained_model(
            path, load_tokenizer=False
        )
        # config round-tripped; params carry checkpoint values
        np.testing.assert_array_equal(
            np.asarray(model.params["image_newline"]), sd["model.image_newline"]
        )
        np.testing.assert_array_equal(
            np.asarray(model.params["lm"]["embed"]["embedding"]),
            sd["model.embed_tokens.weight"],
        )
        assert "beats" in model.params and "audio_proj" in model.params
        assert ctx_len == 512

        # drive generation end-to-end with the loaded weights
        rng = np.random.default_rng(0)
        # override vocab-dependent sizes to tiny cfg values already in config.json
        mcfg = model.cfg
        T = 4
        toks = model.generate(
            jnp.asarray(rng.integers(2, 100, (1, 16)), jnp.int32),
            jnp.asarray([4], jnp.int32),
            jnp.asarray(
                rng.normal(0, 1, (1, T, mcfg.siglip.image_size, mcfg.siglip.image_size, 3)),
                jnp.float32,
            ),
            jnp.asarray(
                rng.normal(0, 1, (1, T, mcfg.dino.image_size, mcfg.dino.image_size, 3)),
                jnp.float32,
            ),
            jnp.ones((1, T), jnp.bool_),
            jnp.asarray(rng.integers(1, 50, (1, 5)), jnp.int32),
            jnp.ones((1, 5), jnp.bool_),
            max_new_tokens=3,
            max_len=256,
            max_visual_len=128,
        )
        assert toks.shape == (1, 3)


def _tiny_llama():
    """tdc_tiny with the Llama-family LM traits (tied embeddings, no qkv
    bias) — the TDC-Llama3_2-3B artifact shape at test size."""
    import dataclasses

    from tdc_video_tpu.config import LM_TINY

    lm = dataclasses.replace(
        LM_TINY, name="llama", tie_word_embeddings=True, attention_bias=False
    )
    return dataclasses.replace(tdc_tiny(), lm=lm, conv_version="llama3_2")


class TestCheckpointFlavorBijection:
    """Closed loop over the reference's three artifact flavors x both LM
    families: synthesize flavor -> load -> export (save_checkpoint_dir) ->
    reload -> the param trees AND eager LM logits are identical.
    Reference flavors: full dir, LoRA adapter + non_lora_trainables.bin,
    mm-projector adapter (/root/reference/tdc/builder.py:81-178,
    mm_trainer.py:487-535)."""

    def _logits(self, cfg, params):
        import jax.numpy as jnp

        from tdc_video_tpu.models.lm import lm_forward

        ids = jnp.asarray(np.arange(1, 9, dtype=np.int32))[None]
        return np.asarray(
            lm_forward(cfg.lm, params["lm"], input_ids=ids, dtype=jnp.float32)
        )

    def _assert_roundtrip(self, cfg, params, tmp_path, tag):
        """Export -> reload -> bitwise tree equality + identical logits."""
        import jax

        from tdc_video_tpu.convert.to_hf import save_checkpoint_dir

        out = str(tmp_path / f"export-{tag}")
        save_checkpoint_dir(params, cfg, out)
        _, model2, _, _ = load_pretrained_model(out, load_tokenizer=False)
        flat1 = jax.tree_util.tree_leaves_with_path(params)
        flat2 = dict(jax.tree_util.tree_leaves_with_path(model2.params))
        assert len(flat1) == len(flat2)
        for path, leaf in flat1:
            np.testing.assert_array_equal(
                np.asarray(leaf, np.float32),
                np.asarray(flat2[path], np.float32),
                err_msg=f"{tag}: {path}",
            )
        np.testing.assert_array_equal(
            self._logits(cfg, params), self._logits(model2.cfg, model2.params)
        )

    @pytest.mark.parametrize("family", ["qwen2", "llama"], ids=str)
    def test_full_flavor(self, tmp_path, family):
        cfg = tdc_tiny() if family == "qwen2" else _tiny_llama()
        path = str(tmp_path / "full")
        write_checkpoint(path, cfg)
        _, model, _, _ = load_pretrained_model(path, load_tokenizer=False)
        assert model.cfg.lm.name == cfg.lm.name
        assert model.cfg.lm.tie_word_embeddings == cfg.lm.tie_word_embeddings
        self._assert_roundtrip(model.cfg, model.params, tmp_path, f"full-{family}")

    @pytest.mark.parametrize("family", ["qwen2", "llama"], ids=str)
    def test_lora_flavor(self, tmp_path, family):
        """peft-layout LoRA over a base checkpoint: merged weights must equal
        the numpy oracle base + B@A*(alpha/r), plus non-LoRA overrides."""
        import torch
        from safetensors.numpy import save_file

        cfg = tdc_tiny() if family == "qwen2" else _tiny_llama()
        base_path = str(tmp_path / "base")
        base_sd = write_checkpoint(base_path, cfg)

        rng = np.random.default_rng(21)
        r, alpha = 2, 8
        adapter = {}
        H, Q = cfg.lm.hidden_size, cfg.lm.q_dim
        for i in range(cfg.lm.num_layers):
            k = f"base_model.model.model.layers.{i}.self_attn.q_proj"
            adapter[k + ".lora_A.weight"] = rng.normal(0, 0.1, (r, H)).astype(np.float32)
            adapter[k + ".lora_B.weight"] = rng.normal(0, 0.1, (Q, r)).astype(np.float32)
        new_frame_seg = rng.normal(0, 1, base_sd["model.frame_seg"].shape).astype(
            np.float32
        )
        lora_path = str(tmp_path / "tdc-lora-ft")
        os.makedirs(lora_path, exist_ok=True)
        save_file(adapter, os.path.join(lora_path, "adapter_model.safetensors"))
        torch.save(
            {"base_model.model.model.frame_seg": torch.from_numpy(new_frame_seg)},
            os.path.join(lora_path, "non_lora_trainables.bin"),
        )
        with open(os.path.join(lora_path, "adapter_config.json"), "w") as fh:
            json.dump({"r": r, "lora_alpha": alpha}, fh)
        # the reference reads the config from the LoRA dir (builder.py:84)
        import shutil

        shutil.copy(
            os.path.join(base_path, "config.json"),
            os.path.join(lora_path, "config.json"),
        )

        _, model, _, _ = load_pretrained_model(
            lora_path, model_base=base_path, model_name="tdc-lora-ft",
            load_tokenizer=False,
        )
        # numpy oracle: merged q_proj == base + B @ A * (alpha/r)
        for i in range(cfg.lm.num_layers):
            k = f"base_model.model.model.layers.{i}.self_attn.q_proj"
            want = (
                base_sd[f"model.layers.{i}.self_attn.q_proj.weight"]
                + adapter[k + ".lora_B.weight"]
                @ adapter[k + ".lora_A.weight"]
                * (alpha / r)
            )
            got = np.asarray(model.params["lm"]["layers"]["q_proj"]["w"][i]).T
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(model.params["compressor"]["frame_seg"], np.float32),
            new_frame_seg,
            rtol=1e-6,
        )
        self._assert_roundtrip(model.cfg, model.params, tmp_path, f"lora-{family}")

    @pytest.mark.parametrize("family", ["qwen2", "llama"], ids=str)
    def test_mm_adapter_flavor(self, tmp_path, family):
        """mm-projector adapter over a base: SVA + image_newline replaced,
        everything else from the base; round-trips bijectively."""
        from tdc_video_tpu.builder import load_mm_adapter
        from tdc_video_tpu.convert.to_hf import save_mm_adapter
        from tdc_video_tpu.model import init_tdc

        import jax

        cfg = tdc_tiny() if family == "qwen2" else _tiny_llama()
        base_path = str(tmp_path / "base")
        write_checkpoint(base_path, cfg)
        _, model, _, _ = load_pretrained_model(base_path, load_tokenizer=False)

        donor = init_tdc(jax.random.PRNGKey(9), model.cfg)
        adapter_path = os.path.join(str(tmp_path), "mm_projector.bin")
        save_mm_adapter(donor, adapter_path)
        merged = load_mm_adapter(model.params, adapter_path, model.cfg)

        # adapter keys replaced, base keys untouched
        np.testing.assert_allclose(
            np.asarray(merged["image_newline"], np.float32),
            np.asarray(donor["image_newline"], np.float32),
            rtol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(merged["lm"]["embed"]["embedding"]),
            np.asarray(model.params["lm"]["embed"]["embedding"]),
        )
        self._assert_roundtrip(model.cfg, merged, tmp_path, f"adapter-{family}")
