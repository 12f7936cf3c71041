"""LM core tests: numerical parity vs HF (tiny random models) and KV-cache
consistency.  The reference has no tests (SURVEY.md section 4); golden-value
parity against the HF implementations the reference wraps is our substitute."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import LMConfig
from tdc_video_tpu.models import lm as lm_mod


def _tiny_cfg(name="qwen2"):
    if name == "qwen2":
        return LMConfig(
            name="qwen2",
            vocab_size=128,
            hidden_size=32,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=8,
            intermediate_size=64,
            rope_theta=10000.0,
            max_position_embeddings=128,
            attention_bias=True,
            pad_token_id=0,
            eos_token_ids=(1,),
        )
    return LMConfig(
        name="llama",
        vocab_size=128,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=8,
        intermediate_size=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        rope_scaling=(32.0, 1.0, 4.0, 64),
        max_position_embeddings=128,
        tie_word_embeddings=True,
        attention_bias=False,
        pad_token_id=0,
        eos_token_ids=(1,),
    )


def _hf_model(cfg: LMConfig):
    import torch

    torch.manual_seed(0)
    if cfg.name == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM

        hf_cfg = Qwen2Config(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            num_key_value_heads=cfg.num_kv_heads,
            intermediate_size=cfg.intermediate_size,
            head_dim=cfg.head_dim,
            rope_theta=cfg.rope_theta,
            rms_norm_eps=cfg.rms_norm_eps,
            max_position_embeddings=cfg.max_position_embeddings,
            tie_word_embeddings=False,
        )
        return Qwen2ForCausalLM(hf_cfg).eval()
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        intermediate_size=cfg.intermediate_size,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=True,
        attention_bias=False,
        rope_scaling={
            "rope_type": "llama3",
            "factor": cfg.rope_scaling[0],
            "low_freq_factor": cfg.rope_scaling[1],
            "high_freq_factor": cfg.rope_scaling[2],
            "original_max_position_embeddings": cfg.rope_scaling[3],
        },
    )
    return LlamaForCausalLM(hf_cfg).eval()


@pytest.mark.parametrize("name", ["qwen2", "llama"])
def test_hf_logit_parity(name):
    import torch

    cfg = _tiny_cfg(name)
    model = _hf_model(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    from tdc_video_tpu.convert.from_hf import convert_lm

    params = jax.tree_util.tree_map(jnp.asarray, convert_lm(sd, cfg))

    ids = np.array([[3, 17, 45, 2, 99, 100, 7, 12]], dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(ids.astype(np.int64))).logits.numpy()

    ours = lm_mod.lm_forward(cfg, params, input_ids=jnp.asarray(ids), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_prefill_decode_matches_full_forward():
    cfg = _tiny_cfg("qwen2")
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg)
    B, T = 2, 6
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T + 3), 0, cfg.vocab_size)

    # Full forward over T+3 tokens.
    full_logits = lm_mod.lm_forward(cfg, params, input_ids=ids, dtype=jnp.float32)

    # Prefill T tokens, then decode 3 steps; logits must match the full pass.
    cache = lm_mod.init_kv_cache(cfg, B, capacity=T + 8, dtype=jnp.float32)
    embeds = lm_mod.embed_tokens(cfg, params, ids[:, :T], jnp.float32)
    mask = jnp.ones((B, T), jnp.bool_)
    logits, cache = lm_mod.prefill(cfg, params, embeds, mask, cache, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, T - 1]), rtol=1e-4, atol=1e-4
    )
    for step in range(3):
        tok = ids[:, T + step : T + step + 1]
        emb = lm_mod.embed_tokens(cfg, params, tok, jnp.float32)
        logits, cache = lm_mod.decode_step(cfg, params, emb, cache, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full_logits[:, T + step]), rtol=1e-4, atol=1e-4
        )


def test_ragged_prefill_decode():
    """Right-padded batch: per-sample lengths must be respected."""
    cfg = _tiny_cfg("qwen2")
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg)
    ids_a = jax.random.randint(jax.random.PRNGKey(2), (1, 4), 0, cfg.vocab_size)
    ids_b = jax.random.randint(jax.random.PRNGKey(3), (1, 7), 0, cfg.vocab_size)

    # Individual forwards.
    la = lm_mod.lm_forward(cfg, params, input_ids=ids_a, dtype=jnp.float32)[0, -1]
    lb = lm_mod.lm_forward(cfg, params, input_ids=ids_b, dtype=jnp.float32)[0, -1]

    # Batched right-padded prefill.
    T = 7
    ids = jnp.zeros((2, T), jnp.int32)
    ids = ids.at[0, :4].set(ids_a[0]).at[1, :].set(ids_b[0])
    mask = jnp.zeros((2, T), jnp.bool_).at[0, :4].set(True).at[1, :].set(True)
    cache = lm_mod.init_kv_cache(cfg, 2, capacity=T + 4, dtype=jnp.float32)
    embeds = lm_mod.embed_tokens(cfg, params, ids, jnp.float32)
    logits, cache = lm_mod.prefill(cfg, params, embeds, mask, cache, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(la), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(lb), rtol=1e-4, atol=1e-4)


def test_lm_loss_ignores_masked_labels():
    cfg = _tiny_cfg("qwen2")
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg)
    B, T = 1, 8
    ids = jax.random.randint(jax.random.PRNGKey(4), (B, T), 0, cfg.vocab_size)
    embeds = lm_mod.embed_tokens(cfg, params, ids, jnp.float32)
    labels_all = ids
    labels_none = jnp.full((B, T), -100, jnp.int32)
    mask = jnp.ones((B, T), jnp.bool_)
    loss_all = lm_mod.lm_loss(cfg, params, embeds, labels_all, mask, remat=False, dtype=jnp.float32)
    loss_none = lm_mod.lm_loss(
        cfg, params, embeds, labels_none, mask, remat=False, dtype=jnp.float32
    )
    assert np.isfinite(float(loss_all)) and float(loss_all) > 0
    assert float(loss_none) == 0.0


def test_chunked_loss_matches():
    """loss_chunk (scan + per-chunk logit remat) must match the unchunked CE
    in value AND gradient — including a ragged tail chunk and masked labels."""
    cfg = _tiny_cfg("qwen2")
    params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg)
    B, T = 2, 11  # T-1 = 10 -> chunk 4 leaves a ragged tail of 2
    ids = jax.random.randint(jax.random.PRNGKey(4), (B, T), 0, cfg.vocab_size)
    embeds = lm_mod.embed_tokens(cfg, params, ids, jnp.float32)
    labels = np.asarray(ids).copy()
    labels[:, :3] = -100
    labels = jnp.asarray(labels)
    mask = jnp.ones((B, T), jnp.bool_)

    def loss(p, chunk):
        return lm_mod.lm_loss(
            cfg, p, embeds, labels, mask, remat=False, dtype=jnp.float32,
            loss_chunk=chunk,
        )

    l0, g0 = jax.value_and_grad(loss)(params, None)
    l1, g1 = jax.value_and_grad(loss)(params, 4)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        ),
        g0, g1,
    )
