"""Q-Former parity vs HF InstructBlipQFormerModel (same BLIP-2 lineage and
query/text-split semantics as the reference tdc/Qformer.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import QFormerConfig
from tdc_video_tpu.models import qformer as qf


def _cfg():
    return QFormerConfig(
        vocab_size=99,
        hidden_size=32,
        num_layers=4,
        num_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        cross_attention_freq=2,
        encoder_width=40,
        query_length=4,
    )


def _remap_instructblip(sd):
    """InstructBlip uses attention.attention.* / layernorm; the reference BLIP
    Q-Former (and our converter) uses attention.self.* / LayerNorm."""
    out = {}
    for k, v in sd.items():
        k = "bert." + k
        k = k.replace("attention.attention.", "attention.self.")
        k = k.replace("crossattention.attention.", "crossattention.self.")
        k = k.replace("embeddings.layernorm.", "embeddings.LayerNorm.")
        out[k] = v.numpy()
    return out


def test_qformer_parity_with_text():
    import torch
    from transformers import InstructBlipQFormerConfig
    from transformers.models.instructblip.modeling_instructblip import (
        InstructBlipQFormerModel,
    )

    cfg = _cfg()
    torch.manual_seed(0)
    hf = InstructBlipQFormerModel(
        InstructBlipQFormerConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            cross_attention_frequency=cfg.cross_attention_freq,
            encoder_hidden_size=cfg.encoder_width,
        )
    ).eval()

    from tdc_video_tpu.convert.from_hf import convert_qformer

    params = jax.tree_util.tree_map(
        jnp.asarray, convert_qformer(_remap_instructblip(hf.state_dict()), cfg)
    )

    rng = np.random.default_rng(0)
    B, Q, L, S = 2, cfg.query_length, 6, 10
    query = rng.normal(size=(B, Q, cfg.hidden_size)).astype(np.float32)
    ids = rng.integers(1, cfg.vocab_size, size=(B, L))
    text_mask = np.ones((B, L), bool)
    text_mask[1, 4:] = False
    enc = rng.normal(size=(B, S, cfg.encoder_width)).astype(np.float32)
    enc_mask = np.ones((B, S), bool)
    enc_mask[0, 7:] = False

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(
                np.concatenate([np.ones((B, Q), np.int64), text_mask.astype(np.int64)], 1)
            ),
            query_embeds=torch.tensor(query),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.tensor(enc_mask.astype(np.int64)),
        ).last_hidden_state.numpy()[:, :Q]

    ours = qf.qformer_forward(
        cfg,
        params,
        jnp.asarray(query),
        jnp.asarray(ids),
        jnp.asarray(text_mask),
        jnp.asarray(enc),
        jnp.asarray(enc_mask),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_qformer_no_text():
    cfg = _cfg()
    params = qf.init_qformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, Q, S = 3, cfg.query_length, 8
    query = jnp.asarray(rng.normal(size=(B, Q, cfg.hidden_size)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(B, S, cfg.encoder_width)), jnp.float32)
    out = qf.qformer_forward(cfg, params, query, None, None, enc)
    assert out.shape == (B, Q, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_qformer_encoder_mask_blocks_padding():
    """Fully-masked encoder positions must not change the output."""
    cfg = _cfg()
    params = qf.init_qformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    B, Q, S = 1, cfg.query_length, 6
    query = jnp.asarray(rng.normal(size=(B, Q, cfg.hidden_size)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(B, S, cfg.encoder_width)), jnp.float32)
    mask = jnp.asarray([[True, True, True, False, False, False]])
    out1 = qf.qformer_forward(cfg, params, query, None, None, enc, mask)
    enc2 = enc.at[0, 3:].set(123.0)  # garbage in masked slots
    out2 = qf.qformer_forward(cfg, params, query, None, None, enc2, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6, atol=1e-6)
