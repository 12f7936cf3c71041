"""Golden-activation parity: conversion + forward vs pinned HF reference
activations (tests/golden/*.npz, generated once by
scripts/make_golden_fixtures.py) — re-checks numerics parity per round
without instantiating torch models.  The same .npz layout is the per-stage
activation-diff harness for real TDC checkpoints when those are available
(reference checkpoints listed at /root/reference/README.md:50-52)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} not generated")
    z = np.load(path)
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd/")}
    ins = {k[3:]: z[k] for k in z.files if k.startswith("in/")}
    outs = {k[4:]: z[k] for k in z.files if k.startswith("out/")}
    meta = json.loads(bytes(z["meta"]).decode())
    return sd, ins, outs, meta


def test_golden_siglip():
    from tdc_video_tpu.config import ViTConfig
    from tdc_video_tpu.convert.from_hf import convert_siglip
    from tdc_video_tpu.models.vit import vit_forward

    sd, ins, outs, meta = _load("siglip")
    cfg = ViTConfig(**meta["cfg"])
    params = jax.tree_util.tree_map(jnp.asarray, convert_siglip(sd, cfg))
    ours = vit_forward(cfg, params, jnp.asarray(ins["px"]), interpolate=False)
    np.testing.assert_allclose(np.asarray(ours), outs["last_hidden"], rtol=2e-4, atol=2e-4)


def test_golden_dinov2():
    from tdc_video_tpu.config import ViTConfig
    from tdc_video_tpu.convert.from_hf import convert_dinov2
    from tdc_video_tpu.models.vit import vit_forward

    sd, ins, outs, meta = _load("dinov2")
    cfg = ViTConfig(**meta["cfg"])
    params = jax.tree_util.tree_map(jnp.asarray, convert_dinov2(sd, cfg))
    ours = vit_forward(cfg, params, jnp.asarray(ins["px"]), interpolate=False)
    np.testing.assert_allclose(
        np.asarray(ours), outs["last_hidden"][:, 1:], rtol=3e-4, atol=3e-4
    )


@pytest.mark.parametrize("name", ["qwen2", "llama"])
def test_golden_lm(name):
    from tdc_video_tpu.config import LMConfig
    from tdc_video_tpu.convert.from_hf import convert_lm
    from tdc_video_tpu.models import lm as lm_mod

    sd, ins, outs, meta = _load(f"lm_{name}")
    kw = dict(meta["cfg"])
    for k in ("rope_scaling", "eos_token_ids"):
        if isinstance(kw.get(k), list):
            kw[k] = tuple(kw[k])
    cfg = LMConfig(**kw)
    params = jax.tree_util.tree_map(jnp.asarray, convert_lm(sd, cfg))
    logits = lm_mod.lm_forward(
        cfg, params, input_ids=jnp.asarray(ins["input_ids"]), dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(logits), outs["logits"], rtol=2e-4, atol=2e-4)


def test_golden_qformer():
    from tdc_video_tpu.config import QFormerConfig
    from tdc_video_tpu.convert.from_hf import convert_qformer
    from tdc_video_tpu.models import qformer as qf

    sd, ins, outs, meta = _load("qformer")
    cfg = QFormerConfig(**meta["cfg"])
    params = jax.tree_util.tree_map(jnp.asarray, convert_qformer(sd, cfg))
    ours = qf.qformer_forward(
        cfg,
        params,
        jnp.asarray(ins["query"]),
        jnp.asarray(ins["input_ids"]),
        jnp.asarray(ins["text_mask"]),
        jnp.asarray(ins["enc"]),
        jnp.asarray(ins["enc_mask"]),
    )
    np.testing.assert_allclose(np.asarray(ours), outs["query_hidden"], rtol=3e-4, atol=3e-4)


def test_golden_compression():
    """Replays the T=64 audio-on compression emission fixture: byte-stable
    emission order (static+sep / per-chunk K+sep, budget clamp, ragged tail)
    across refactors of compress/tdc.py."""
    import jax

    from tdc_video_tpu.compress import tdc as tdc_mod
    from tdc_video_tpu.config import tdc_tiny

    sd, inp, out, meta = _load("compression")
    cfg = tdc_tiny(audio=True)
    template = tdc_mod.init_compressor(jax.random.PRNGKey(int(meta["seed"])), cfg)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(sd[f"{i:04d}"]) for i in range(len(leaves))]
    )
    got, n_vis = tdc_mod.compress_video(
        cfg,
        params,
        jnp.asarray(inp["frames"]),
        jnp.asarray(inp["mask"]),
        jnp.asarray(inp["boundary"]),
        jnp.asarray(inp["text_ids"]),
        jnp.asarray(inp["text_mask"]),
        jnp.asarray(inp["audio"]),
        max_visual_len=int(meta["max_visual"]),
    )
    assert int(n_vis) == int(out["n_visual"])
    np.testing.assert_allclose(
        np.asarray(got)[: int(n_vis)], out["emission"], rtol=2e-5, atol=2e-5
    )
