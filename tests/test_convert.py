"""Checkpoint conversion tests for the TDC-specific converters.

convert_lm/siglip/dinov2/qformer get functional HF-parity coverage in
test_lm/test_vit/test_qformer; here the SVA / compressor / BEATs / full-TDC
mappings are validated against synthetic state dicts with per-key unique
values (catches any mis-keyed path), plus numeric oracles for the
weight-norm fold and the LoRA merge.
"""

import numpy as np
import pytest

from tdc_video_tpu.config import BEATS_TINY, QFORMER_TINY, tdc_tiny
from tdc_video_tpu.convert.from_hf import (
    convert_beats,
    convert_compressor,
    convert_sva,
    convert_tdc,
)
from tdc_video_tpu.builder import merge_lora


def _uniq():
    counter = [0]

    def make(*shape):
        counter[0] += 1
        rng = np.random.default_rng(counter[0])
        return rng.normal(0, 1, shape).astype(np.float32)

    return make


def _lin_sd(sd, name, d_in, d_out, make, bias=True):
    sd[name + ".weight"] = make(d_out, d_in)
    if bias:
        sd[name + ".bias"] = make(d_out)


def _ln_sd(sd, name, d, make):
    sd[name + ".weight"] = make(d)
    sd[name + ".bias"] = make(d)


def make_sva_sd(prefix="model.", d=32, towers=2, depth=2, groups=1, H=64):
    make = _uniq()
    sd = {}
    tower_dims = [16, 24]
    for t in range(towers):
        ap = f"{prefix}mm_projector_aux_{t}."
        _lin_sd(sd, ap + "0", tower_dims[t], d, make)
        _lin_sd(sd, ap + "2", d, d, make)
        _ln_sd(sd, ap + "3", d, make)
    for g in range(groups):
        for li in range(depth):
            lp = f"{prefix}vision_sampler_{g}.layers.{li}."
            _lin_sd(sd, lp + "proj_context", d, d, make, bias=False)
            _lin_sd(sd, lp + "proj_in", 2 * d, d, make, bias=False)
            _ln_sd(sd, lp + "cross_attn.q_proj.0", d, make)
            _lin_sd(sd, lp + "cross_attn.q_proj.1", d, d, make, bias=False)
            for t in range(towers):
                _ln_sd(sd, lp + f"cross_attn.k_proj_{t}.0", d, make)
                _lin_sd(sd, lp + f"cross_attn.k_proj_{t}.1", d, d, make, bias=False)
                _ln_sd(sd, lp + f"cross_attn.v_proj_{t}.0", d, make)
                _lin_sd(sd, lp + f"cross_attn.v_proj_{t}.1", d, d, make, bias=False)
                sd[lp + f"pos_embed_{t}"] = make(4, d)
            _lin_sd(sd, lp + "cross_attn.o_proj", d, d, make, bias=False)
            _ln_sd(sd, lp + "norm", d, make)
            _lin_sd(sd, lp + "proj_out.linear_1", d, d, make, bias=False)
            _lin_sd(sd, lp + "proj_out.linear_2", d, d, make, bias=False)
    sd[prefix + "vision_query"] = make(groups, d)
    _lin_sd(sd, prefix + "mm_projector.0", d * groups, H, make)
    _lin_sd(sd, prefix + "mm_projector.2", H, H, make)
    return sd


class TestConvertSVA:
    def test_mapping(self):
        sd = make_sva_sd()
        p = convert_sva(sd, num_towers=2, num_groups=1, depth=2)
        # every mapped leaf must be the transposed/raw source array
        np.testing.assert_array_equal(
            p["aux_projectors"][0]["fc1"]["w"],
            sd["model.mm_projector_aux_0.0.weight"].T,
        )
        np.testing.assert_array_equal(
            p["aux_projectors"][1]["norm"]["bias"], sd["model.mm_projector_aux_1.3.bias"]
        )
        L1 = p["samplers"][0]["layers"][1]
        np.testing.assert_array_equal(
            L1["proj_in"]["w"], sd["model.vision_sampler_0.layers.1.proj_in.weight"].T
        )
        np.testing.assert_array_equal(
            L1["kv"][1]["v_proj"]["lin"]["w"],
            sd["model.vision_sampler_0.layers.1.cross_attn.v_proj_1.1.weight"].T,
        )
        np.testing.assert_array_equal(
            L1["pos_embed"][0], sd["model.vision_sampler_0.layers.1.pos_embed_0"]
        )
        np.testing.assert_array_equal(
            p["mm_projector"]["fc2"]["b"], sd["model.mm_projector.2.bias"]
        )
        # structure usable by sva_forward
        import jax.numpy as jnp
        from tdc_video_tpu.config import SVAConfig
        from tdc_video_tpu.models.sva import sva_forward

        cfg = SVAConfig(
            vision_hidden_size=32,
            query_num_list=(4,),
            image_token_len=4,
            num_heads=2,
            tower_token_len_list=(16, 16),
            connector_depth=2,
        )
        feats = [jnp.ones((1, 16, 16)), jnp.ones((1, 16, 24))]
        out = sva_forward(cfg, p, feats)
        assert out.shape == (1, 4, 64)
        assert bool(jnp.isfinite(out).all())


def make_beats_sd(cfg, prefix=""):
    make = _uniq()
    sd = {}
    d, f = cfg.encoder_embed_dim, cfg.ffn_dim
    sd[prefix + "patch_embedding.weight"] = make(cfg.embed_dim, 1, 16, 16)
    _ln_sd(sd, prefix + "layer_norm", cfg.embed_dim, make)
    _lin_sd(sd, prefix + "post_extract_proj", cfg.embed_dim, d, make)
    sd[prefix + "encoder.pos_conv.0.weight_g"] = np.abs(make(1, 1, 128)) + 0.1
    sd[prefix + "encoder.pos_conv.0.weight_v"] = make(d, d // 16, 128)
    sd[prefix + "encoder.pos_conv.0.bias"] = make(d)
    _ln_sd(sd, prefix + "encoder.layer_norm", d, make)
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layers.{i}."
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _lin_sd(sd, lp + "self_attn." + n, d, d, make)
        _ln_sd(sd, lp + "self_attn_layer_norm", d, make)
        _lin_sd(sd, lp + "fc1", d, f, make)
        _lin_sd(sd, lp + "fc2", f, d, make)
        _ln_sd(sd, lp + "final_layer_norm", d, make)
        _lin_sd(sd, lp + "self_attn.grep_linear", d // cfg.num_heads, 8, make)
        sd[lp + "self_attn.grep_a"] = make(1, cfg.num_heads, 1, 1)
    sd[prefix + "encoder.layers.0.self_attn.relative_attention_bias.weight"] = make(
        cfg.num_buckets, cfg.num_heads
    )
    return sd


class TestConvertBeats:
    def test_mapping_and_forward(self):
        import jax.numpy as jnp
        from tdc_video_tpu.models.beats import beats_forward

        cfg = BEATS_TINY
        sd = make_beats_sd(cfg)
        p = convert_beats(sd, cfg)
        assert p["layers"]["q_proj"]["w"].shape[0] == cfg.num_layers
        np.testing.assert_array_equal(
            p["layers"]["grep_a"][1], sd["encoder.layers.1.self_attn.grep_a"].reshape(-1)
        )
        fb = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 32, 128)), jnp.float32)
        out, _ = beats_forward(cfg, p, fb)
        assert out.shape == (1, 16, cfg.encoder_embed_dim)
        assert bool(jnp.isfinite(out).all())

    def test_weight_norm_fold_matches_torch(self):
        import torch

        conv = torch.nn.Conv1d(32, 32, 8, padding=4, groups=4)
        wn = torch.nn.utils.parametrizations.weight_norm(conv, name="weight", dim=2)
        sdt = {k: v.detach() for k, v in wn.state_dict().items()}
        g = sdt["parametrizations.weight.original0"].numpy()
        v = sdt["parametrizations.weight.original1"].numpy()
        norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
        folded = (g / np.maximum(norm, 1e-12)) * v
        np.testing.assert_allclose(
            folded, wn.weight.detach().numpy(), rtol=1e-5, atol=1e-6
        )


class TestConvertCompressor:
    def test_mapping(self):
        cfg = QFORMER_TINY
        make = _uniq()
        sd = {}
        prefix = "model."
        qp = prefix + "Qformer.bert."
        d, f, E = cfg.hidden_size, cfg.intermediate_size, cfg.encoder_width
        sd[qp + "embeddings.word_embeddings.weight"] = make(cfg.vocab_size, d)
        sd[qp + "embeddings.position_embeddings.weight"] = make(64, d)
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

        p = convert_compressor(sd, cfg)
        assert p["query_tokens"].shape == (cfg.query_length, d)
        np.testing.assert_array_equal(p["frame_seg"], sd["model.frame_seg"])
        np.testing.assert_array_equal(
            p["qformer"]["layers"][2]["ffn_query"]["fc1"]["w"],
            sd[qp + "encoder.layer.2.intermediate_query.dense.weight"].T,
        )
        assert p["qformer"]["layers"][1]["cross_attn"] is None
        assert p["qformer"]["layers"][2]["cross_attn"] is not None


class TestMergeLora:
    def test_merge_math(self):
        rng = np.random.default_rng(0)
        W = rng.normal(size=(8, 6)).astype(np.float32)
        A = rng.normal(size=(2, 6)).astype(np.float32)  # lora_A [r, in]
        B = rng.normal(size=(8, 2)).astype(np.float32)  # lora_B [out, r]
        sd = {"model.layers.0.self_attn.q_proj.weight": W}
        ad = {
            "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": A,
            "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": B,
            "base_model.model.model.frame_seg": np.ones(4, np.float32),
        }
        out = merge_lora(sd, ad, adapter_config={"lora_alpha": 16, "r": 2})
        np.testing.assert_allclose(
            out["model.layers.0.self_attn.q_proj.weight"], W + (B @ A) * 8.0, rtol=1e-6
        )
        np.testing.assert_array_equal(out["model.frame_seg"], np.ones(4, np.float32))
