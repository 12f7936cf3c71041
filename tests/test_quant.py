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
