"""End-to-end multimodal model tests at tiny scale.

Covers the full reference inference path (SURVEY.md section 3.1-3.2):
towers -> SVA -> segmentation -> TDC compression -> splice -> LM
loss/generate, including the audio branch, on toy configs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import tdc_tiny
from tdc_video_tpu.constants import IGNORE_INDEX
from tdc_video_tpu.model import (
    encode_audio,
    encode_frames,
    frame_token_len,
    init_tdc,
    prepare_multimodal_inputs,
    tdc_loss,
)
from tdc_video_tpu.ops.audio import second_groups
from tdc_video_tpu.serving.generate import generate, generate_text_only


@pytest.fixture(scope="module")
def setup():
    cfg = tdc_tiny()
    params = init_tdc(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def setup_audio():
    cfg = tdc_tiny(audio=True)
    params = init_tdc(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(cfg, B=2, T=8, L=24, key=0, with_labels=True):
    rng = np.random.default_rng(key)
    s = cfg.siglip.image_size
    d = cfg.dino.image_size
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, 100, (B, L)), jnp.int32),
        "image_pos": jnp.asarray([5, 7][:B], jnp.int32),
        "siglip_px": jnp.asarray(rng.normal(0, 1, (B, T, s, s, 3)), jnp.float32),
        "dino_px": jnp.asarray(rng.normal(0, 1, (B, T, d, d, 3)), jnp.float32),
        "frame_mask": jnp.asarray([[True] * T, [True] * (T // 2) + [False] * (T - T // 2)][:B]),
        "qformer_text_ids": jnp.asarray(rng.integers(1, 50, (B, 6)), jnp.int32),
        "qformer_text_mask": jnp.ones((B, 6), jnp.bool_),
        "text_len": jnp.asarray([L, L - 4][:B], jnp.int32),
    }
    if with_labels:
        labels = np.full((B, L), IGNORE_INDEX, np.int32)
        labels[:, 12:] = rng.integers(2, 100, (B, L - 12))
        batch["labels"] = jnp.asarray(labels)
    return batch


class TestEncodeFrames:
    def test_shapes_and_newline(self, setup):
        cfg, params = setup
        T = 4
        s, d = cfg.siglip.image_size, cfg.dino.image_size
        sig = jnp.zeros((T, s, s, 3))
        dino = jnp.zeros((T, d, d, 3))
        feats, dino_feats = encode_frames(cfg, params, sig, dino)
        P = frame_token_len(cfg)
        side = cfg.sva.final_side_len
        assert P == cfg.sva.image_token_len + side
        assert feats.shape == (T, P, cfg.lm.hidden_size)
        assert dino_feats.shape == (T, cfg.dino.interp_tokens, cfg.dino.hidden_size)
        # newline token occupies every (side+1)-th column slot
        grid = np.asarray(feats).reshape(T, side, side + 1, -1)
        nl = grid[:, :, side, :]
        assert np.allclose(nl[0, 0], nl[1, 1], atol=1e-5)


class TestPrepareInputs:
    def test_splice_layout_and_labels(self, setup):
        cfg, params = setup
        batch = _batch(cfg)
        mm = prepare_multimodal_inputs(
            cfg,
            params,
            batch["input_ids"],
            batch["image_pos"],
            batch["siglip_px"],
            batch["dino_px"],
            batch["frame_mask"],
            batch["qformer_text_ids"],
            batch["qformer_text_mask"],
            labels=batch["labels"],
            text_len=batch["text_len"],
            max_len=256,
            max_visual_len=128,
        )
        B, L = batch["input_ids"].shape
        assert mm["embeds"].shape == (B, 256, cfg.lm.hidden_size)
        seq_len = np.asarray(mm["seq_len"])
        text_len = np.asarray(batch["text_len"])
        n_visual = seq_len - (text_len - 1)
        assert (n_visual > 0).all()
        # sample 1 has half the frames of sample 0 -> fewer visual tokens
        assert n_visual[1] < n_visual[0]
        # visual region labels are IGNORE_INDEX
        labels = np.asarray(mm["labels"])
        ipos = np.asarray(batch["image_pos"])
        for b in range(B):
            assert (labels[b, ipos[b] : ipos[b] + n_visual[b]] == IGNORE_INDEX).all()
        # attention mask matches seq_len
        assert (np.asarray(mm["attn_mask"]).sum(1) == seq_len).all()

    def test_loss_finite_and_grad(self, setup):
        cfg, params = setup
        batch = _batch(cfg)
        loss = tdc_loss(cfg, params, batch, max_len=256, max_visual_len=128, remat=False)
        assert np.isfinite(float(loss))

        def loss_of_seg(p):
            pp = dict(params)
            pp["compressor"] = p
            return tdc_loss(cfg, pp, batch, max_len=256, max_visual_len=128, remat=False)

        g = jax.grad(loss_of_seg)(params["compressor"])
        gn = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0
        )
        assert np.isfinite(gn) and gn > 0  # gradients flow through the compressor


class TestAudioPath:
    def test_audio_tokens_into_loss(self, setup_audio):
        cfg, params = setup_audio
        B, T = 2, 8
        batch = _batch(cfg, B=B, T=T)
        # 2 windows of 10 s audio per sample -> 20 seconds; keep T=8 frames
        keep = np.zeros(20, np.int64)
        keep[np.linspace(0, 19, T).astype(int)] = 1
        f, p, g = second_groups(keep)
        wav = jnp.asarray(np.random.default_rng(1).normal(0, 0.05, (2, 160000)), jnp.float32)
        mask = jnp.ones((2, 160000), jnp.bool_)
        atok = encode_audio(
            cfg, params, wav, mask, jnp.asarray(f), jnp.asarray(p), jnp.asarray(g), T
        )
        assert atok.shape == (T, 50, cfg.lm.hidden_size)
        batch["audio_tokens"] = jnp.broadcast_to(atok[None], (B,) + atok.shape)
        loss = tdc_loss(cfg, params, batch, max_len=512, max_visual_len=400, remat=False)
        assert np.isfinite(float(loss))


class TestGenerate:
    def test_text_only_greedy_matches_forward(self, setup):
        cfg, params = setup
        from tdc_video_tpu.models.lm import lm_forward

        rng = np.random.default_rng(7)
        ids = jnp.asarray(rng.integers(2, 100, (1, 10)), jnp.int32)
        mask = jnp.ones((1, 10), jnp.bool_)
        toks = generate_text_only(cfg, params, ids, mask, max_new_tokens=3)
        # oracle: argmax of the full forward, fed back step by step
        cur = np.asarray(ids)
        want = []
        for _ in range(3):
            logits = lm_forward(cfg.lm, params["lm"], jnp.asarray(cur), dtype=cfg.dtype)
            nxt = int(jnp.argmax(logits[0, cur.shape[1] - 1]))
            want.append(nxt)
            if nxt in cfg.lm.eos_token_ids:
                break
            cur = np.concatenate([cur, [[nxt]]], axis=1)
        got = [int(t) for t in np.asarray(toks)[0][: len(want)]]
        assert got == want

    def test_multimodal_generate_shapes(self, setup):
        cfg, params = setup
        batch = _batch(cfg, with_labels=False)
        toks = generate(
            cfg,
            params,
            batch["input_ids"],
            batch["image_pos"],
            batch["siglip_px"],
            batch["dino_px"],
            batch["frame_mask"],
            batch["qformer_text_ids"],
            batch["qformer_text_mask"],
            text_len=batch["text_len"],
            max_new_tokens=4,
            max_len=256,
            max_visual_len=128,
        )
        assert toks.shape == (2, 4)
        assert (np.asarray(toks) >= 0).all()


class TestMultiImage:
    def test_prepare_multi_image(self, setup):
        """Two <image> slots per sample through the uncompressed stage-1 image
        path (reference cambrian_arch.py:1457-1734 multi-image splice)."""
        from tdc_video_tpu.model import prepare_multimodal_multi_image

        cfg, params = setup
        B, M, L = 2, 2, 24
        rng = np.random.default_rng(5)
        s, d = cfg.siglip.image_size, cfg.dino.image_size
        out = prepare_multimodal_multi_image(
            cfg,
            params,
            jnp.asarray(rng.integers(2, 100, (B, L)), jnp.int32),
            jnp.asarray([[3, 9], [5, -1]], jnp.int32),  # row 1 has ONE image
            jnp.asarray(rng.normal(0, 1, (B, M, s, s, 3)), jnp.float32),
            jnp.asarray(rng.normal(0, 1, (B, M, d, d, 3)), jnp.float32),
            labels=jnp.asarray(rng.integers(2, 100, (B, L)), jnp.int32),
            max_len=128,
        )
        P = frame_token_len(cfg)
        assert out["embeds"].shape == (B, 128, cfg.lm.hidden_size)
        assert int(out["seq_len"][0]) == L + 2 * P - 2
        assert int(out["seq_len"][1]) == L + P - 1
        assert np.isfinite(np.asarray(out["embeds"])).all()
        # visual positions carry IGNORE_INDEX labels
        lab = np.asarray(out["labels"])
        assert (lab[0, 3 : 3 + P] == IGNORE_INDEX).all()
