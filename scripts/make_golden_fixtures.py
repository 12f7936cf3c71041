"""Generate the golden-activation fixture pack (tests/golden/*.npz).

Each fixture pins: an HF reference module's state dict (tiny config, fixed
torch seed), a fixed input, and the reference forward's output.  The golden
tests (tests/test_golden.py) then re-check conversion + forward parity every
round WITHOUT re-instantiating torch models — and the same .npz format is the
per-stage activation-diff harness for the day real TDC checkpoints are
available (VERDICT r1 item 9; SURVEY §7 "numerics parity").

Run from the repo root:  python scripts/make_golden_fixtures.py
Regenerate only when a parity surface (converter layout / tiny config)
changes; commit the .npz files.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
OUT = os.path.join(ROOT, "tests", "golden")


def _save(name: str, sd: dict, inputs: dict, outputs: dict, meta: dict):
    os.makedirs(OUT, exist_ok=True)
    payload = {f"sd/{k}": np.asarray(v) for k, v in sd.items()}
    payload.update({f"in/{k}": np.asarray(v) for k, v in inputs.items()})
    payload.update({f"out/{k}": np.asarray(v) for k, v in outputs.items()})
    payload["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    path = os.path.join(OUT, f"{name}.npz")
    np.savez_compressed(path, **payload)
    print(f"{name}: {os.path.getsize(path) / 1e6:.2f} MB")


def siglip():
    import torch
    from test_vit import _siglip_cfg
    from transformers import SiglipVisionConfig, SiglipVisionModel

    cfg = _siglip_cfg()
    torch.manual_seed(0)
    hf = SiglipVisionModel(
        SiglipVisionConfig(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
        )
    ).eval()
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(px.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    _save(
        "siglip",
        {k: v.numpy() for k, v in hf.state_dict().items()},
        {"px": px},
        {"last_hidden": ref},
        {"cfg": cfg.__dict__},
    )


def dinov2():
    import torch
    from test_vit import _dino_cfg
    from transformers import Dinov2Config, Dinov2Model

    cfg = _dino_cfg()
    torch.manual_seed(0)
    hf = Dinov2Model(
        Dinov2Config(
            hidden_size=cfg.hidden_size,
            mlp_ratio=1,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            use_swiglu_ffn=True,
            layerscale_value=1.0,
        )
    ).eval()
    swiglu_hidden = hf.encoder.layer[0].mlp.weights_out.in_features
    rng = np.random.default_rng(1)
    px = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(px.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    meta = {"cfg": {**cfg.__dict__, "intermediate_size": swiglu_hidden}}
    _save(
        "dinov2",
        {k: v.numpy() for k, v in hf.state_dict().items()},
        {"px": px},
        {"last_hidden": ref},
        meta,
    )


def lm(name: str):
    import torch
    from test_lm import _hf_model, _tiny_cfg

    cfg = _tiny_cfg("qwen2" if name == "qwen2" else "llama")
    hf = _hf_model(cfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(2, cfg.vocab_size, size=(2, 12))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    _save(
        f"lm_{name}",
        {k: v.numpy() for k, v in hf.state_dict().items()},
        {"input_ids": ids},
        {"logits": ref},
        {"cfg": {k: list(v) if isinstance(v, tuple) else v for k, v in cfg.__dict__.items()}},
    )


def qformer():
    import torch
    from test_qformer import _cfg, _remap_instructblip
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
    _save(
        "qformer",
        _remap_instructblip(hf.state_dict()),
        {
            "query": query,
            "input_ids": ids,
            "text_mask": text_mask,
            "enc": enc,
            "enc_mask": enc_mask,
        },
        {"query_hidden": ref},
        {"cfg": cfg.__dict__},
    )


def compression():
    """Full TDC compression emission at T=64 with audio: locks the
    emission-order surface (static+sep / per-chunk K+sep layout, budget
    clamp, ragged tail) against refactors of compress/tdc.py.  No torch —
    the fixture pins our own batched implementation, cross-checked against
    the numpy reference-loop oracle at save time
    (tests/test_compress.py::_oracle_compress)."""
    import jax
    import jax.numpy as jnp

    from tdc_video_tpu.compress import tdc as tdc_mod
    from tdc_video_tpu.config import tdc_tiny
    from test_compress import _oracle_compress

    cfg = tdc_tiny(audio=True)
    params = tdc_mod.init_compressor(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    T, P, H = 64, 6, cfg.lm.hidden_size
    frames = rng.normal(size=(T, P, H)).astype(np.float32)
    aud = rng.normal(size=(T, 3, H)).astype(np.float32)
    boundary = np.zeros(T, bool)
    boundary[[0, 9, 17, 40, 41, 55]] = True
    n_valid = 60  # ragged tail: frames 60..63 masked
    mask = np.arange(T) < n_valid
    text_ids = np.array([5, 9, 2, 11], np.int32)
    text_mask = np.ones(4, bool)
    max_visual = 768

    got, n_vis = tdc_mod.compress_video(
        cfg,
        params,
        jnp.asarray(frames),
        jnp.asarray(mask),
        jnp.asarray(boundary),
        jnp.asarray(text_ids),
        jnp.asarray(text_mask),
        jnp.asarray(aud),
        max_visual_len=max_visual,
    )
    ref = _oracle_compress(
        cfg,
        jax.tree_util.tree_map(np.asarray, params),
        frames[:n_valid],
        boundary[:n_valid],
        text_ids,
        text_mask,
        aud[:n_valid],
        max_visual,
    )
    n_vis = int(n_vis)
    assert n_vis == len(ref), (n_vis, len(ref))
    np.testing.assert_allclose(np.asarray(got)[:n_vis], ref, rtol=2e-5, atol=2e-5)

    leaves, _ = jax.tree_util.tree_flatten(params)
    sd = {f"{i:04d}": np.asarray(l) for i, l in enumerate(leaves)}
    _save(
        "compression",
        sd,
        {
            "frames": frames, "audio": aud, "boundary": boundary,
            "mask": mask, "text_ids": text_ids, "text_mask": text_mask,
        },
        {"emission": np.asarray(got)[:n_vis], "n_visual": np.asarray(n_vis)},
        {"seed": 7, "max_visual": max_visual, "audio": True, "T": T},
    )


if __name__ == "__main__":
    siglip()
    dinov2()
    lm("qwen2")
    lm("llama")
    qformer()
    compression()
    print("golden fixtures written to", OUT)