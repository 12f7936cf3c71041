"""Export round-trip: params -> reference-format state dict -> reload ->
identical tree; plus delta make/apply inverse."""

import os

import numpy as np
import pytest

import jax

from tdc_video_tpu.config import tdc_tiny
from tdc_video_tpu.convert.from_hf import convert_tdc
from tdc_video_tpu.convert.to_hf import export_tdc, save_checkpoint_dir


def _tree_equal(a, b, rtol=1e-6):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, leaf in la:
        other = lb[path]
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32).squeeze(),
            np.asarray(other, np.float32).squeeze(),
            rtol=rtol, atol=1e-6, err_msg=str(path),
        )


@pytest.mark.slow
def test_export_reimport_roundtrip(tmp_path):
    from tdc_video_tpu.model import init_tdc

    cfg = tdc_tiny(audio=False)
    params = init_tdc(jax.random.PRNGKey(3), cfg)
    sd = export_tdc(params, cfg)
    # every exported key reloads into an identical tree
    back = convert_tdc(sd, cfg)
    _tree_equal(
        {k: v for k, v in params.items() if k != "beats"},
        back,
    )


def test_save_checkpoint_dir_loads_via_builder(tmp_path):
    from tdc_video_tpu.builder import load_pretrained_model
    from tdc_video_tpu.model import init_tdc

    cfg = tdc_tiny()
    params = init_tdc(jax.random.PRNGKey(4), cfg)
    out = str(tmp_path / "export")
    # carry the tiny dims through the overrides extension
    hf = {
        "tdc_tpu_overrides": {
            "lm": {
                "head_dim": cfg.lm.head_dim,
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
            "sva": {"tower_token_len_list": list(cfg.sva.tower_token_len_list)},
        }
    }
    save_checkpoint_dir(params, cfg, out, hf_config=hf)
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    _, model, _, _ = load_pretrained_model(out, load_tokenizer=False)
    np.testing.assert_allclose(
        np.asarray(model.params["image_newline"], np.float32),
        np.asarray(params["image_newline"], np.float32),
        rtol=1e-6,
    )


def test_delta_ops(tmp_path):
    from safetensors.numpy import save_file

    from tdc_video_tpu.cli.model_ops import cmd_apply_delta, cmd_make_delta

    rng = np.random.default_rng(0)
    base = {"model.x.weight": rng.normal(size=(4, 4)).astype(np.float32)}
    target = {"model.x.weight": base["model.x.weight"] + 1.0}
    bd, td, dd, rd = (str(tmp_path / n) for n in ("base", "target", "delta", "recon"))
    for d, sd in ((bd, base), (td, target)):
        os.makedirs(d)
        save_file(sd, os.path.join(d, "model.safetensors"))

    class A:
        pass

    a = A()
    a.base, a.target, a.delta = bd, td, dd
    cmd_make_delta(a)
    a2 = A()
    a2.base, a2.delta, a2.target = bd, dd, rd
    cmd_apply_delta(a2)
    from tdc_video_tpu.builder import load_state_dict

    recon = load_state_dict(rd)
    np.testing.assert_allclose(recon["model.x.weight"], target["model.x.weight"], rtol=1e-6)


def test_delta_vocab_resize_slice_combines():
    """A delta over a resized-vocab model slice-combines the overlapping
    embed/head rows and keeps the new rows intact (the reference's
    dimension-mismatch branch, tdc/apply_delta.py)."""
    from tdc_video_tpu.cli.model_ops import combine_state_dicts

    rng = np.random.default_rng(1)
    base = {
        "model.embed_tokens.weight": rng.normal(size=(4, 3)).astype(np.float32),
        "lm_head.weight": rng.normal(size=(4, 3)).astype(np.float32),
    }
    target = {
        "model.embed_tokens.weight": rng.normal(size=(6, 3)).astype(np.float32),
        "lm_head.weight": rng.normal(size=(6, 3)).astype(np.float32),
        "model.mm_projector.weight": rng.normal(size=(3, 3)).astype(np.float32),
    }
    delta = combine_state_dicts(target, base, sign=-1)
    recon = combine_state_dicts(delta, base, sign=+1)
    for k in target:
        np.testing.assert_allclose(recon[k], target[k], rtol=1e-5, atol=1e-6)
    # extra rows of the delta ARE the target rows (no base to subtract)
    np.testing.assert_allclose(
        delta["lm_head.weight"][4:], target["lm_head.weight"][4:], rtol=1e-6
    )


def test_delta_non_vocab_mismatch_raises():
    """Any other shape mismatch must error loudly, never silently copy."""
    import pytest

    from tdc_video_tpu.cli.model_ops import combine_state_dicts

    base = {"model.layers.0.mlp.weight": np.zeros((4, 4), np.float32)}
    bad = {"model.layers.0.mlp.weight": np.ones((8, 4), np.float32)}
    with pytest.raises(ValueError, match="shape mismatch"):
        combine_state_dicts(bad, base, sign=+1)


def test_mm_adapter_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from tdc_video_tpu.builder import load_mm_adapter
    from tdc_video_tpu.config import tdc_tiny
    from tdc_video_tpu.convert.to_hf import save_mm_adapter
    from tdc_video_tpu.model import init_tdc

    cfg = tdc_tiny()
    trained = init_tdc(jax.random.PRNGKey(7), cfg)
    path = str(tmp_path / "mm_projector.safetensors")
    save_mm_adapter(trained, path)

    base = init_tdc(jax.random.PRNGKey(8), cfg)
    merged = load_mm_adapter(base, path, cfg)
    # sva + newline come from the adapter; the LM stays the base's
    np.testing.assert_allclose(
        np.asarray(merged["image_newline"], np.float32),
        np.asarray(trained["image_newline"], np.float32),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(merged["sva"]["vision_query"], np.float32).squeeze(),
        np.asarray(trained["sva"]["vision_query"], np.float32).squeeze(),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(merged["lm"]["final_norm"]["scale"]),
        np.asarray(base["lm"]["final_norm"]["scale"]),
    )


def test_beats_export_roundtrip():
    import jax

    from tdc_video_tpu.config import BEATS_TINY
    from tdc_video_tpu.convert.from_hf import convert_beats
    from tdc_video_tpu.convert.to_hf import export_beats
    from tdc_video_tpu.models.beats import init_beats

    params = init_beats(jax.random.PRNGKey(2), BEATS_TINY)
    sd = export_beats(params, "model.audio_encoder.beats.")
    back = convert_beats(sd, BEATS_TINY, prefix="model.audio_encoder.beats.")
    _tree_equal(params, back, rtol=1e-5)


def test_delta_wrong_base_raises():
    """Applying a delta against a mismatched base (most keys missing) must
    fail loudly instead of passing raw delta weights through (the reference
    asserts an explicit allowlist, tdc/apply_delta.py; ADVICE r4)."""
    import pytest

    from tdc_video_tpu.cli.model_ops import combine_state_dicts

    delta = {f"model.layers.{i}.weight": np.ones((2, 2), np.float32) for i in range(4)}
    wrong_base = {"different.naming.weight": np.ones((2, 2), np.float32)}
    with pytest.raises(ValueError, match="missing from base"):
        combine_state_dicts(delta, wrong_base, sign=+1)
    # a genuinely-new minority of keys (mm_projector flavor) still passes
    base = dict(delta)
    extra = dict(delta)
    extra["model.mm_projector.weight"] = np.ones((2, 2), np.float32)
    out = combine_state_dicts(extra, base, sign=-1)
    assert "model.mm_projector.weight" in out
