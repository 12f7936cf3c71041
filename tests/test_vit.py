"""Vision tower parity tests vs HF tiny random SigLIP / DINOv2 models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import ViTConfig
from tdc_video_tpu.models import vit as vit_mod


def _siglip_cfg():
    return ViTConfig(
        name="siglip",
        image_size=56,
        patch_size=14,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        interp_tokens=16,
    )


def _dino_cfg():
    return ViTConfig(
        name="dinov2",
        image_size=56,
        patch_size=14,
        hidden_size=48,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        use_cls_token=True,
        use_swiglu=True,
        layerscale=True,
        interp_tokens=16,
    )


def test_siglip_parity():
    import torch
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
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    from tdc_video_tpu.convert.from_hf import convert_siglip

    params = jax.tree_util.tree_map(jnp.asarray, convert_siglip(sd, cfg))

    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(px.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    ours = vit_mod.vit_forward(cfg, params, jnp.asarray(px), interpolate=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_dinov2_parity():
    import torch
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
    # HF swiglu hidden = int(mlp_ratio * hidden * 2/3) rounded up to /8.
    swiglu_hidden = hf.encoder.layer[0].mlp.weights_out.in_features
    cfg = ViTConfig(**{**cfg.__dict__, "intermediate_size": swiglu_hidden})
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    from tdc_video_tpu.convert.from_hf import convert_dinov2

    params = jax.tree_util.tree_map(jnp.asarray, convert_dinov2(sd, cfg))

    rng = np.random.default_rng(1)
    px = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(px.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    ours = vit_mod.vit_forward(cfg, params, jnp.asarray(px), interpolate=False)
    # ours drops CLS; HF keeps it at index 0
    np.testing.assert_allclose(np.asarray(ours), ref[:, 1:], rtol=3e-4, atol=3e-4)


def test_bilinear_resize_matches_torch():
    import torch

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 49, 8)).astype(np.float32)  # 7x7 grid
    ref = (
        torch.nn.functional.interpolate(
            torch.tensor(x).view(2, 7, 7, 8).permute(0, 3, 1, 2),
            size=(4, 4),
            mode="bilinear",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .reshape(2, 16, 8)
        .numpy()
    )
    ours = vit_mod.bilinear_resize_tokens(jnp.asarray(x), 7, 4)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_prepare_pos_embed_resizes():
    cfg = _dino_cfg()
    params = vit_mod.init_vit(jax.random.PRNGKey(0), cfg)
    # pretend checkpoint grid was 6x6 (+cls)
    params["pos_embed"] = jnp.asarray(np.random.default_rng(3).normal(size=(37, 48)), jnp.float32)
    out = vit_mod.prepare_pos_embed(params, cfg)
    assert out["pos_embed"].shape == (cfg.num_patches + 1, 48)
