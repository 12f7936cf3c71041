"""Weight-only int8 LM quantization tests (models/quant.py) — the TPU-native
replacement for the reference's bitsandbytes 4/8-bit loading options
(tdc/builder.py:58-67)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.models import lm as lm_mod
from tdc_video_tpu.models.quant import (
    dequantize_linear,
    quantize_lm_int8,
    quantize_linear_int8,
)


def _cfg():
    from test_lm import _tiny_cfg

    return _tiny_cfg("qwen2")


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    p = {"w": jnp.asarray(rng.normal(0, 0.05, (64, 32)), jnp.float32)}
    q = quantize_linear_int8(p)
    assert q["w_q"].dtype == jnp.int8
    back = dequantize_linear(q)
    err = np.abs(np.asarray(back["w"]) - np.asarray(p["w"])).max()
    # per-channel symmetric int8: error <= scale/2 per channel
    assert err <= float(np.asarray(q["w_scale"]).max()) / 2 + 1e-7


def test_lm_logits_drift_bounded():
    cfg = _cfg()
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_lm_int8(params)
    # quantized leaves are int8, embeddings untouched
    assert qparams["layers"]["q_proj"]["w_q"].dtype == jnp.int8
    assert "embedding" in qparams["embed"]
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (2, 16)), jnp.int32)
    ref = lm_mod.lm_forward(cfg, params, input_ids=ids, dtype=jnp.float32)
    got = lm_mod.lm_forward(cfg, qparams, input_ids=ids, dtype=jnp.float32)
    ref, got = np.asarray(ref), np.asarray(got)
    # weight-only int8 keeps logits close; greedy argmax nearly always agrees
    rel = np.abs(ref - got).max() / np.abs(ref).max()
    assert rel < 0.05, rel
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_quantized_decode_runs():
    cfg = _cfg()
    params = {"lm": lm_mod.init_lm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)}
    from tdc_video_tpu.config import tdc_tiny
    from tdc_video_tpu.serving.generate import generate_text_only

    tcfg = tdc_tiny()
    import dataclasses

    tcfg = dataclasses.replace(tcfg, lm=cfg)
    params["lm"] = quantize_lm_int8(params["lm"])
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (1, 8)), jnp.int32)
    out = generate_text_only(tcfg, params, ids, jnp.ones(ids.shape, bool), max_new_tokens=6)
    assert out.shape == (1, 6)


def test_builder_quantize_flag(tmp_path):
    from test_builder import write_checkpoint
    from tdc_video_tpu.builder import load_pretrained_model
    from tdc_video_tpu.config import tdc_tiny

    ckpt = str(tmp_path / "ckpt")
    write_checkpoint(ckpt, tdc_tiny(), audio=False)
    _, model, _, _ = load_pretrained_model(ckpt, load_tokenizer=False, quantize="int8")
    assert model.params["lm"]["layers"]["q_proj"]["w_q"].dtype == jnp.int8
    with pytest.raises(ValueError):
        load_pretrained_model(ckpt, load_tokenizer=False, quantize="int4")


class TestInt8Towers:
    """int8 MXU-compute tower quantization (quantize_vit_int8 +
    layers.int8_matmul): the compute-bound analog of the LM's weight-only
    path — activations dynamically quantized per token, s8 x s8 dot."""

    def test_int8_matmul_matches_f32(self):
        from tdc_video_tpu.models.layers import int8_matmul
        from tdc_video_tpu.models.quant import quantize_linear_int8

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (32, 64)), jnp.float32)
        p = {"w": jnp.asarray(rng.normal(0, 0.05, (64, 48)), jnp.float32)}
        q = quantize_linear_int8(p)
        ref = np.asarray(x @ p["w"])
        got = np.asarray(int8_matmul(x, q["w_q"], q["w_scale"]))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 0.03, rel

    def test_tower_feature_drift_bounded(self):
        from tdc_video_tpu.config import tdc_tiny
        from tdc_video_tpu.models.quant import quantize_vit_int8
        from tdc_video_tpu.models.vit import init_vit, vit_forward

        cfg = tdc_tiny()
        rng = np.random.default_rng(3)
        for name, vcfg in (("siglip", cfg.siglip), ("dino", cfg.dino)):
            p = init_vit(jax.random.PRNGKey(0), vcfg, jnp.float32)
            px = jnp.asarray(
                rng.normal(0, 1, (2, vcfg.image_size, vcfg.image_size, 3)),
                jnp.float32,
            )
            ref = np.asarray(vit_forward(vcfg, p, px))
            got = np.asarray(vit_forward(vcfg, quantize_vit_int8(p), px))
            rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            cos = (got * ref).sum() / (
                np.linalg.norm(got) * np.linalg.norm(ref)
            )
            assert rel < 0.05, (name, rel)
            assert cos > 0.995, (name, cos)

    def test_tower_static_act_scales_drift_bounded(self):
        """Static W8A8 (calibrate_vit_act_scales + quantize_vit_int8
        act_scales=...) stays close to f32 on data from the calibration
        distribution — the bench/serving fast path that removes the
        per-token amax pass (PERF.md round 3)."""
        from tdc_video_tpu.config import tdc_tiny
        from tdc_video_tpu.models.quant import (
            calibrate_vit_act_scales,
            quantize_vit_int8,
        )
        from tdc_video_tpu.models.vit import init_vit, vit_forward

        cfg = tdc_tiny()
        rng = np.random.default_rng(5)
        for name, vcfg in (("siglip", cfg.siglip), ("dino", cfg.dino)):
            p = init_vit(jax.random.PRNGKey(1), vcfg, jnp.float32)
            calib = jnp.asarray(
                rng.normal(0, 1, (2, vcfg.image_size, vcfg.image_size, 3)),
                jnp.float32,
            )
            px = jnp.asarray(
                rng.normal(0, 1, (2, vcfg.image_size, vcfg.image_size, 3)),
                jnp.float32,
            )
            scales = calibrate_vit_act_scales(
                vcfg, p, calib, dtype=jnp.float32
            )
            assert set(scales) == {"qkv", "attn", "mlp", "down"}
            assert all(v.shape == (vcfg.num_layers,) for v in scales.values())
            qp = quantize_vit_int8(p, act_scales=scales)
            ref = np.asarray(vit_forward(vcfg, p, px))
            got = np.asarray(vit_forward(vcfg, qp, px))
            rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            cos = (got * ref).sum() / (
                np.linalg.norm(got) * np.linalg.norm(ref)
            )
            assert rel < 0.06, (name, rel)
            assert cos > 0.995, (name, cos)

    def test_encode_compress_int8_drift(self):
        """End-to-end encode+compress with int8 towers stays close to f32
        (the serving configuration behind `--quantize int8-all`)."""
        from tdc_video_tpu.config import tdc_tiny
        from tdc_video_tpu.model import encode_frames, init_tdc
        from tdc_video_tpu.models.quant import quantize_vit_int8

        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(4)
        T = 3
        sig = jnp.asarray(
            rng.normal(0, 1, (T, cfg.siglip.image_size, cfg.siglip.image_size, 3)),
            jnp.float32,
        )
        dino = jnp.asarray(
            rng.normal(0, 1, (T, cfg.dino.image_size, cfg.dino.image_size, 3)),
            jnp.float32,
        )
        ref, _ = encode_frames(cfg, params, sig, dino)
        qparams = dict(params)
        qparams["siglip"] = quantize_vit_int8(params["siglip"])
        qparams["dino"] = quantize_vit_int8(params["dino"])
        got, _ = encode_frames(cfg, qparams, sig, dino)
        ref, got = np.asarray(ref), np.asarray(got)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.08, rel

    def test_builder_int8_all(self, tmp_path):
        from test_builder import write_checkpoint
        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.config import tdc_tiny

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        _, model, _, _ = load_pretrained_model(
            ckpt, load_tokenizer=False, quantize="int8-all"
        )
        assert model.params["siglip"]["layers"]["q_proj"]["w_q"].dtype == jnp.int8
        assert model.params["dino"]["layers"]["q_proj"]["w_q"].dtype == jnp.int8
        assert model.params["lm"]["layers"]["q_proj"]["w_q"].dtype == jnp.int8
        # the SVA connector and Q-Former stay float (3% of pipeline time)
        assert "w" in model.params["sva"]["mm_projector"]["fc1"]

    def test_builder_int8_all_calibrated(self, tmp_path):
        """calib_pixels=(sig, dino) attaches static per-layer act scales."""
        from test_builder import write_checkpoint
        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.config import tdc_tiny

        cfg = tdc_tiny()
        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, cfg, audio=False)
        rng = np.random.default_rng(11)
        sig = rng.normal(0, 1, (2, cfg.siglip.image_size, cfg.siglip.image_size, 3))
        dino = rng.normal(0, 1, (2, cfg.dino.image_size, cfg.dino.image_size, 3))
        _, model, _, _ = load_pretrained_model(
            ckpt, load_tokenizer=False, quantize="int8-all",
            calib_pixels=(sig, dino),
        )
        for tower, vcfg in (("siglip", cfg.siglip), ("dino", cfg.dino)):
            asc = model.params[tower]["layers"]["act_scale"]
            assert set(asc) == {"qkv", "attn", "mlp", "down"}
            assert all(v.shape == (vcfg.num_layers,) for v in asc.values())
            assert all(np.all(np.asarray(v) > 0) for v in asc.values())


class TestInt8KVCache:
    """int8 KV cache (models/lm.py init_kv_cache(quant="int8")): decode
    streams the cache every token, so int8 halves its HBM traffic.  Replaces
    the bf16 HF cache of the reference decode loop
    (tdc/language_model/cambrian_qwen.py:150-184)."""

    def test_greedy_agreement_vs_bf16_kv(self):
        from tdc_video_tpu.config import tdc_tiny
        from tdc_video_tpu.serving.generate import generate_text_only

        cfg = tdc_tiny()
        params = {"lm": lm_mod.init_lm(jax.random.PRNGKey(0), cfg.lm, dtype=jnp.float32)}
        rng = np.random.default_rng(5)
        ids = jnp.asarray(rng.integers(2, cfg.lm.vocab_size, (2, 12)), jnp.int32)
        mask = jnp.ones(ids.shape, jnp.bool_)
        ref = generate_text_only(cfg, params, ids, mask, max_new_tokens=10)
        got = generate_text_only(cfg, params, ids, mask, max_new_tokens=10, kv_quant="int8")
        ref, got = np.asarray(ref), np.asarray(got)
        agree = (ref == got).mean()
        assert agree >= 0.8, (agree, ref, got)

    def test_prefill_logits_drift_bounded(self):
        cfg = _cfg()
        params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(6)
        ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (2, 16)), jnp.int32)
        mask = jnp.ones(ids.shape, jnp.bool_)
        embeds = lm_mod.embed_tokens(cfg, params, ids, jnp.float32)
        ref_logits, _ = lm_mod.prefill(
            cfg, params, embeds, mask, lm_mod.init_kv_cache(cfg, 2, 16, jnp.float32),
            dtype=jnp.float32,
        )
        got_logits, qcache = lm_mod.prefill(
            cfg, params, embeds, mask, lm_mod.init_kv_cache(cfg, 2, 16, quant="int8"),
            dtype=jnp.float32,
        )
        assert qcache["k"].dtype == jnp.int8
        ref_l, got_l = np.asarray(ref_logits), np.asarray(got_logits)
        rel = np.abs(ref_l - got_l).max() / np.abs(ref_l).max()
        assert rel < 0.05, rel

    def test_engine_with_int8_kv(self):
        from tdc_video_tpu.config import tdc_tiny
        from tdc_video_tpu.model import init_tdc
        from tdc_video_tpu.serving.batching import DecodeEngine, Request

        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        eng = DecodeEngine(cfg, params, num_slots=2, capacity=32, chunk_tokens=4,
                           kv_quant="int8")
        rng = np.random.default_rng(9)
        ids = rng.integers(2, 50, (1, 6)).astype(np.int32)
        embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], jnp.asarray(ids), cfg.dtype)
        eng.submit(Request(embeds=embeds, attn_mask=jnp.ones(ids.shape, bool),
                           max_new_tokens=5, uid="q"))
        done = eng.run()
        assert len(done) == 1 and 1 <= len(done[0].tokens) <= 5


class TestInt8ActQuantPrefill:
    """int8 MXU prefill (act_quant=True): projections run s8 x s8 with
    per-token activation scales — 1.56x weight-only prefill on-chip
    (PERF.md).  Decode steps stay weight-only."""

    def test_prefill_logits_drift_bounded(self):
        cfg = _cfg()
        params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        qparams = quantize_lm_int8(params)
        rng = np.random.default_rng(11)
        ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (2, 24)), jnp.int32)
        ref = lm_mod.lm_forward(cfg, params, input_ids=ids, dtype=jnp.float32)
        got = lm_mod.lm_forward(cfg, qparams, input_ids=ids, dtype=jnp.float32, act_quant=True)
        ref, got = np.asarray(ref), np.asarray(got)
        rel = np.abs(ref - got).max() / np.abs(ref).max()
        assert rel < 0.08, rel
        agree = (ref.argmax(-1) == got.argmax(-1)).mean()
        assert agree > 0.85, agree

    def test_float_weights_unaffected(self):
        """act_quant is a no-op for float weights (training paths)."""
        cfg = _cfg()
        params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(12)
        ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (1, 8)), jnp.int32)
        a = lm_mod.lm_forward(cfg, params, input_ids=ids, dtype=jnp.float32)
        b = lm_mod.lm_forward(cfg, params, input_ids=ids, dtype=jnp.float32, act_quant=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_generation_end_to_end(self):
        from tdc_video_tpu.config import tdc_tiny
        from tdc_video_tpu.serving.generate import generate_text_only

        cfg = tdc_tiny()
        params = {"lm": quantize_lm_int8(lm_mod.init_lm(jax.random.PRNGKey(0), cfg.lm, dtype=jnp.float32))}
        rng = np.random.default_rng(13)
        ids = jnp.asarray(rng.integers(2, cfg.lm.vocab_size, (1, 10)), jnp.int32)
        mask = jnp.ones(ids.shape, bool)
        ref = generate_text_only(cfg, params, ids, mask, max_new_tokens=8)
        got = generate_text_only(cfg, params, ids, mask, max_new_tokens=8, act_quant=True)
        agree = (np.asarray(ref) == np.asarray(got)).mean()
        assert agree >= 0.75, (agree, ref, got)
