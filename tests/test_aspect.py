"""Aspect-ratio (unpad_image) parity: non-square videos must emit only the
content-region tokens, with the Q-Former query pooled over exactly those."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import tdc_tiny
from tdc_video_tpu.compress.aspect import frame_token_layout, square_layout
from tdc_video_tpu.compress.tdc import compress_video, init_compressor
from tdc_video_tpu.model import frame_token_len


class TestLayout:
    def test_square_all_valid(self):
        cfg = tdc_tiny()
        tv, qp = square_layout(cfg)
        assert tv.all()
        assert tv.shape[0] == frame_token_len(cfg)
        np.testing.assert_allclose(qp.sum(1), 1.0, rtol=1e-6)

    def test_landscape_crops_rows(self):
        cfg = tdc_tiny()  # side 4, newline on -> P = 4*5 = 20
        side = cfg.sva.final_side_len
        tv, qp = frame_token_layout(cfg, orig_h=9, orig_w=16)
        grid = tv.reshape(side, side + 1)
        # 16:9 at side 4: new_h = int(9*4/16) = 2, pad = 1 -> rows 1..2 kept
        assert not grid[0].any() and not grid[side - 1].any()
        assert grid[1, :side].all() and grid[1, side]  # content + newline
        # pooling weights only touch valid tokens and rows sum to 1
        assert (qp[:, ~tv] == 0).all()
        np.testing.assert_allclose(qp.sum(1), 1.0, rtol=1e-6)

    def test_portrait_crops_cols(self):
        cfg = tdc_tiny()
        side = cfg.sva.final_side_len
        tv, _ = frame_token_layout(cfg, orig_h=16, orig_w=9)
        grid = tv.reshape(side, side + 1)
        assert not grid[:, 0].any()  # padded first column cropped
        assert grid[:, side].all()  # newline per (all) rows kept


class TestCompressWithAspect:
    def test_fewer_tokens_and_masked_pooling(self):
        cfg = tdc_tiny()
        params = init_compressor(jax.random.PRNGKey(0), cfg, jnp.float32)
        T = 8
        P = frame_token_len(cfg)
        H = cfg.lm.hidden_size
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(0, 1, (T, P, H)), jnp.float32)
        fmask = jnp.ones((T,), bool)
        boundary = jnp.zeros((T,), bool).at[0].set(True).at[4].set(True)

        def run(tv, qp):
            return compress_video(
                cfg, params, feats, fmask, boundary, None, None,
                max_visual_len=512,
                token_valid=None if tv is None else jnp.asarray(tv),
                query_pool=None if qp is None else jnp.asarray(qp),
            )

        v_sq, n_sq = run(None, None)
        tv, qp = frame_token_layout(cfg, 9, 16)
        v_ar, n_ar = run(tv, qp)
        # static frames emit fewer tokens under the aspect crop
        assert int(n_ar) < int(n_sq)
        # expected: per chunk, static = n_valid + sep; K + sep per other frame
        n_valid = int(tv.sum())
        K = cfg.compression.context_token_num
        n_chunks = 2
        expect = n_chunks * ((n_valid + 1) + (cfg.compression.chunk_size - 1) * (K + 1))
        assert int(n_ar) == expect

        # first emitted tokens are the key frame's VALID tokens in order
        key_valid = np.asarray(feats[0])[np.asarray(tv)]
        np.testing.assert_allclose(
            np.asarray(v_ar[: n_valid]), key_valid, rtol=1e-5
        )

    def test_compressed_tokens_ignore_pad_region(self):
        """Garbage in the pad region must not change the compressed output."""
        cfg = tdc_tiny()
        params = init_compressor(jax.random.PRNGKey(0), cfg, jnp.float32)
        T = 4
        P = frame_token_len(cfg)
        H = cfg.lm.hidden_size
        rng = np.random.default_rng(1)
        feats = rng.normal(0, 1, (T, P, H)).astype(np.float32)
        tv, qp = frame_token_layout(cfg, 9, 16)
        feats2 = feats.copy()
        feats2[:, ~tv] = 100.0  # junk where the aspect mask says padding
        fmask = jnp.ones((T,), bool)
        boundary = jnp.zeros((T,), bool).at[0].set(True)
        out1, n1 = compress_video(
            cfg, params, jnp.asarray(feats), fmask, boundary, None, None,
            max_visual_len=256, token_valid=jnp.asarray(tv), query_pool=jnp.asarray(qp),
        )
        out2, n2 = compress_video(
            cfg, params, jnp.asarray(feats2), fmask, boundary, None, None,
            max_visual_len=256, token_valid=jnp.asarray(tv), query_pool=jnp.asarray(qp),
        )
        assert int(n1) == int(n2)
        np.testing.assert_allclose(
            np.asarray(out1[: int(n1)]), np.asarray(out2[: int(n2)]), rtol=1e-4, atol=1e-4
        )
