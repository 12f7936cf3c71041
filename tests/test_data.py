"""Data layer tests: conversation templates, chat tokenization + label
masking, <image> splicing, packing, image preprocessing."""

import numpy as np
import pytest

from tdc_video_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from tdc_video_tpu.data.conversation import conv_templates
from tdc_video_tpu.data.images import (
    expand2square,
    frame_bucket,
    pad_frames,
    preprocess_frame,
    process_frames,
    SIGLIP_PREPROCESS,
)
from tdc_video_tpu.data.preprocess import (
    SpecialTokens,
    pack_text,
    preprocess,
    preprocess_qwen,
    tokenizer_image_token,
)


class FakeTokenizer:
    """Deterministic word-level tokenizer for offline tests: each whitespace
    token maps to a stable id; known specials get fixed ids."""

    SPECIALS = {
        "<|im_start|>": 201,
        "<|im_end|>": 202,
        "\n": 198,
        "<|begin_of_text|>": 128000,
        "<|start_header_id|>": 128006,
        "<|end_header_id|>": 128007,
        "<|eot_id|>": 128009,
    }

    def encode(self, text):
        import re

        ids = []
        pattern = "|".join(re.escape(s) for s in self.SPECIALS)
        for piece in re.split(f"({pattern})", text):
            if not piece:
                continue
            if piece in self.SPECIALS:
                ids.append(self.SPECIALS[piece])
            else:
                for w in piece.split(" "):
                    if w:
                        ids.append(1000 + (hash(w) % 5000))
        return ids


SP = SpecialTokens(im_start=201, im_end=202, newline=198)


class TestConversation:
    def test_qwen_chatml(self):
        conv = conv_templates["qwen"].copy()
        conv.append_message(conv.roles[0], "<image>\nWhat happens?")
        conv.append_message(conv.roles[1], None)
        p = conv.get_prompt()
        assert p.startswith("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n")
        assert "<|im_start|>user\n<image>\nWhat happens?<|im_end|>\n" in p
        assert p.endswith("<|im_start|>assistant\n")

    def test_llama3_2(self):
        conv = conv_templates["llama3_2"].copy()
        conv.append_message("user", "hi")
        conv.append_message("assistant", None)
        p = conv.get_prompt()
        assert p.startswith("<|begin_of_text|><|start_header_id|>system<|end_header_id|>")
        assert p.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


class TestTokenizerImageToken:
    def test_splice(self):
        tok = FakeTokenizer()
        ids = tokenizer_image_token("hello <image> world", tok)
        assert ids.count(IMAGE_TOKEN_INDEX) == 1
        plain = tok.encode("hello ") + [IMAGE_TOKEN_INDEX] + tok.encode(" world")
        assert ids == plain

    def test_no_image(self):
        tok = FakeTokenizer()
        assert tokenizer_image_token("hello", tok) == tok.encode("hello")

    def test_bos_stripped_per_chunk(self):
        """BOS-prepending tokenizers (llama3 family) emit a BOS per chunk;
        only the leading one survives (reference mm_datautils.py:594-608)."""
        tok = BosFakeTokenizer()
        ids = tokenizer_image_token("hello <image> world", tok, bos_token_id=128000)
        assert ids[0] == 128000
        assert ids.count(128000) == 1
        assert ids.count(IMAGE_TOKEN_INDEX) == 1
        base = FakeTokenizer()
        assert ids == [128000] + base.encode("hello ") + [IMAGE_TOKEN_INDEX] + base.encode(" world")


class BosFakeTokenizer(FakeTokenizer):
    """HF-llama-style tokenizer: prepends BOS on every encode call."""

    bos_token_id = 128000

    def encode(self, text):
        return [self.bos_token_id] + super().encode(text)


class TestPreprocessQwen:
    def _sources(self):
        return [
            [
                {"from": "human", "value": "<image>\nDescribe the video."},
                {"from": "gpt", "value": "A cat jumps."},
            ]
        ]

    def test_masking(self):
        tok = FakeTokenizer()
        out = preprocess_qwen(self._sources(), tok, has_image=True, specials=SP)
        ids = out["input_ids"][0]
        labels = out["labels"][0]
        assert len(ids) == len(labels)
        assert IMAGE_TOKEN_INDEX in ids
        # assistant tokens supervised
        ans = tok.encode("A cat jumps.")
        n_sup = sum(1 for l in labels if l >= 1000)
        assert n_sup >= len(ans)
        # user content masked (only structural + assistant tokens survive)
        i_img = ids.index(IMAGE_TOKEN_INDEX)
        assert labels[i_img] == IGNORE_INDEX
        # structural tokens unmasked
        for i, t in enumerate(ids):
            if t in (201, 202, 198):
                assert labels[i] == t
        # qformer prompt extracted without <image>/newlines
        assert out["prompts"] == ["Describe the video."]

    def test_dispatcher(self):
        tok = FakeTokenizer()
        out = preprocess(self._sources(), tok, conv_version="llama3_2", has_image=True)
        assert out["input_ids"][0][0] == 128000
        with pytest.raises(ValueError):
            preprocess(self._sources(), tok, conv_version="vicuna")

    def test_llama3_single_bos_with_bos_tokenizer(self):
        """Regression (ADVICE r1): a BOS-prepending tokenizer must not leak a
        BOS per turn or after the <image> sentinel — the conversation carries
        exactly one, at position 0."""
        tok = BosFakeTokenizer()
        out = preprocess(self._sources(), tok, conv_version="llama3_2", has_image=True)
        ids = out["input_ids"][0]
        assert ids[0] == 128000
        assert ids.count(128000) == 1
        assert ids.count(IMAGE_TOKEN_INDEX) == 1
        i_img = ids.index(IMAGE_TOKEN_INDEX)
        assert ids[i_img + 1] != 128000


class TestPackText:
    def test_with_image(self):
        ids = [[5, 6, IMAGE_TOKEN_INDEX, 7, 8], [9, 10, 11]]
        labels = [[IGNORE_INDEX, IGNORE_INDEX, IMAGE_TOKEN_INDEX, 7, 8], [9, 10, 11]]
        out = pack_text(ids, labels, max_len=8, pad_id=0)
        assert out["input_ids"].shape == (2, 8)
        assert out["image_pos"][0] == 2 and out["has_image"][0]
        assert not out["has_image"][1]
        assert (out["input_ids"] >= 0).all()  # sentinel replaced
        assert out["labels"][0][2] == IGNORE_INDEX
        assert out["text_len"].tolist() == [5, 3]


class TestImages:
    def test_expand2square(self):
        img = np.full((10, 20, 3), 7, np.uint8)
        sq = expand2square(img, (1, 2, 3))
        assert sq.shape == (20, 20, 3)
        assert (sq[10] == 7).all()
        assert tuple(sq[0, 0]) == (1, 2, 3)

    def test_preprocess_frame_range(self):
        img = np.random.default_rng(0).integers(0, 255, (100, 160, 3), dtype=np.uint8)
        x = preprocess_frame(img, SIGLIP_PREPROCESS)
        assert x.shape == (384, 384, 3)
        assert -1.01 <= x.min() and x.max() <= 1.01
        # padding area is exactly 0 after normalization (mean fill)
        assert abs(float(x[0, 0].mean())) < 0.02

    def test_process_and_pad(self):
        from tdc_video_tpu.config import tdc_tiny

        cfg = tdc_tiny()
        frames = [np.zeros((32, 48, 3), np.uint8)] * 3
        sig, dino = process_frames(frames, cfg)
        assert sig.shape == (3, cfg.siglip.image_size, cfg.siglip.image_size, 3)
        s, d, m = pad_frames(sig, dino, 8)
        assert s.shape[0] == 8 and m.sum() == 3

    def test_bucket(self):
        assert frame_bucket(3) == 8
        assert frame_bucket(100) == 128
        assert frame_bucket(5000) == 1000


class TestProjectorFallbacks:
    def test_variants(self):
        import jax
        import jax.numpy as jnp

        from tdc_video_tpu.models.projector import init_projector, projector_forward

        x = jnp.ones((2, 5, 8))
        p = init_projector(jax.random.PRNGKey(0), "identity", 8, 16)
        assert projector_forward(p, x).shape == (2, 5, 8)
        p = init_projector(jax.random.PRNGKey(0), "linear", 8, 16)
        assert projector_forward(p, x).shape == (2, 5, 16)
        p = init_projector(jax.random.PRNGKey(0), "mlp2x_gelu", 8, 16)
        assert projector_forward(p, x).shape == (2, 5, 16)
        import pytest

        with pytest.raises(ValueError):
            init_projector(jax.random.PRNGKey(0), "conv", 8, 16)


class TestDevicePreprocess:
    def test_matches_host_preprocess(self):
        """On-device pad+resize+normalize must track the PIL host path (both
        bicubic; implementations differ, so tolerance not equality)."""
        import jax.numpy as jnp

        from tdc_video_tpu.config import tdc_qwen2_7b
        from tdc_video_tpu.data.images import device_preprocess, process_frames

        cfg = tdc_qwen2_7b()
        rng = np.random.default_rng(0)
        # smooth-ish content so resampling differences stay small
        base = rng.normal(0, 1, (2, 12, 20)).repeat(8, 1).repeat(8, 2)
        frames = ((base - base.min()) / (np.ptp(base) + 1e-9) * 255).astype(np.uint8)
        frames = np.stack([frames, frames, frames], -1).reshape(2, 96, 160, 3)

        sig_h, dino_h = process_frames(list(frames), cfg)
        sig_d, dino_d = device_preprocess(jnp.asarray(frames), cfg)
        for h, d in ((sig_h, sig_d), (dino_h, dino_d)):
            diff = np.abs(np.asarray(d) - h)
            assert diff.mean() < 0.03, diff.mean()
            assert np.corrcoef(np.asarray(d).ravel(), h.ravel())[0, 1] > 0.995
