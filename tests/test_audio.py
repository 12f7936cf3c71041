"""Audio stack tests: kaldi fbank, BEATs encoder, audio-frame alignment.

Oracle style mirrors SURVEY.md section 4: numpy re-derivations of the
reference algorithms (tdc/audio_models/beats, tdc/cambrian_arch.py:1547-1598)
checked against the batched JAX implementations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import BEATS_TINY, BEATS_BASE
from tdc_video_tpu.models.beats import (
    beats_forward,
    compute_position_bias,
    init_beats,
    patch_embed,
    relative_position_buckets,
)
from tdc_video_tpu.ops.audio import (
    kaldi_fbank,
    num_fbank_frames,
    pool_seconds_to_frames,
    second_groups,
    window_to_seconds,
)


class TestFbank:
    def test_frame_count(self):
        # 10 s @ 16 kHz -> 998 frames -> 62 patch rows -> 496 BEATs tokens.
        assert num_fbank_frames(160000) == 998
        assert num_fbank_frames(16000) == 98
        assert num_fbank_frames(399) == 0

    def test_shape_and_finite(self):
        wav = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, (2, 16000)), jnp.float32)
        fb = kaldi_fbank(wav)
        assert fb.shape == (2, 98, 128)
        assert bool(jnp.isfinite(fb).all())

    def test_sine_peak_bin(self):
        # A pure tone must put its energy at the mel bin covering its frequency.
        sr, f0 = 16000, 1000.0
        t = np.arange(sr) / sr
        wav = jnp.asarray(0.5 * np.sin(2 * np.pi * f0 * t), jnp.float32)[None]
        fb = np.asarray(kaldi_fbank(wav))[0].mean(0)
        peak = fb.argmax()
        # mel bin center for 1 kHz: mel(1000)=1127*ln(1+1000/700)
        mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
        delta = (mel(8000.0) - mel(20.0)) / 129
        expect = (mel(f0) - mel(20.0)) / delta - 1
        assert abs(peak - expect) <= 2

    def test_silence_is_floor(self):
        wav = jnp.zeros((1, 16000), jnp.float32)
        fb = np.asarray(kaldi_fbank(wav))
        assert np.allclose(fb, np.log(1.1920928955078125e-07), atol=1e-4)


class TestRelPosBuckets:
    def test_properties(self):
        b = relative_position_buckets(64, 320, 800)
        assert b.shape == (64, 64)
        assert (np.diag(b) == 0).all()
        assert b.max() < 320
        # forward relations use the upper half of buckets
        assert b[0, 1] >= 160 and b[1, 0] < 160

    def test_oracle(self):
        # Direct scalar re-derivation of the T5 bucketing formula
        # (reference backbone.py:392-417).
        import math

        def oracle(rel, num_buckets=32, max_distance=64):
            ret = 0
            nb = num_buckets // 2
            if rel > 0:
                ret += nb
            rel = abs(rel)
            max_exact = nb // 2
            if rel < max_exact:
                return ret + rel
            large = max_exact + int(
                math.log(rel / max_exact) / math.log(max_distance / max_exact) * (nb - max_exact)
            )
            return ret + min(large, nb - 1)

        b = relative_position_buckets(40, 32, 64)
        for i in [0, 3, 17, 39]:
            for j in [0, 1, 12, 39]:
                assert b[i, j] == oracle(j - i), (i, j)


class TestBeats:
    def test_token_count_10s(self):
        # patch grid for a 10 s window: 998 frames -> 62 x 8 = 496 tokens
        cfg = BEATS_BASE
        F = num_fbank_frames(160000)
        assert (F // cfg.patch_size) * (128 // cfg.patch_size) == 496

    def test_forward_shapes_and_mask(self):
        cfg = BEATS_TINY
        key = jax.random.PRNGKey(0)
        params = init_beats(key, cfg)
        F, M = 64, 128
        fbank = jax.random.normal(jax.random.PRNGKey(1), (2, F, M))
        mask = jnp.ones((2, F), jnp.bool_).at[1, 32:].set(False)
        out, tok_mask = beats_forward(cfg, params, fbank, mask)
        gt = F // cfg.patch_size
        gf = M // cfg.patch_size
        assert out.shape == (2, gt * gf, cfg.encoder_embed_dim)
        assert tok_mask.shape == (2, gt * gf)
        # sample 1: frames 32+ padded -> patch rows 2,3 invalid -> tokens 16+ masked
        assert bool(tok_mask[0].all())
        assert int(tok_mask[1].sum()) == 2 * gf
        assert bool(jnp.isfinite(out).all())

    def test_patch_embed_matches_conv(self):
        """The patch matmul must equal a real stride-16 conv2d."""
        cfg = BEATS_TINY
        params = init_beats(jax.random.PRNGKey(0), cfg)
        fbank = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 128))
        got = patch_embed(cfg, params, fbank)
        w = np.asarray(params["patch_embed"]["w"]).reshape(
            cfg.patch_size, cfg.patch_size, cfg.embed_dim
        )
        x = np.asarray(fbank)[0]
        gt_, gf_ = 32 // 16, 128 // 16
        want = np.zeros((gt_ * gf_, cfg.embed_dim), np.float32)
        for i in range(gt_):
            for j in range(gf_):
                patch = x[i * 16 : (i + 1) * 16, j * 16 : (j + 1) * 16]
                want[i * gf_ + j] = np.einsum("ab,abc->c", patch, w)
        np.testing.assert_allclose(np.asarray(got)[0], want, rtol=2e-4, atol=2e-4)

    def test_position_bias_shared_shape(self):
        cfg = BEATS_TINY
        params = init_beats(jax.random.PRNGKey(0), cfg)
        pb = compute_position_bias(params, cfg, 16)
        assert pb.shape == (cfg.num_heads, 16, 16)


class TestAlignment:
    def test_window_to_seconds(self):
        C = 8
        tokens = jnp.asarray(np.random.default_rng(0).normal(size=(1, 496, C)), jnp.float32)
        secs = window_to_seconds(tokens, 10)
        assert secs.shape == (1, 10, 50, C)
        np.testing.assert_allclose(np.asarray(secs[0, 0]), np.asarray(tokens[0, :50]))
        # last second: 46 tokens adaptive-pooled to 50
        assert bool(jnp.isfinite(secs[:, 9]).all())

    def test_second_groups(self):
        # keep bitmap: seconds 0,1 kept; 2,3 dropped; 4 kept
        f, p, g = second_groups(np.array([1, 1, 0, 0, 1]))
        np.testing.assert_array_equal(f, [0, 1, 1, 1, 2])
        np.testing.assert_array_equal(p, [0, 0, 1, 2, 0])
        np.testing.assert_array_equal(g, [1, 3, 1])

    def test_pool_parity_with_reference_loop(self):
        """Oracle: reference accumulate-and-adaptive-pool loop
        (cambrian_arch.py:1562-1589) re-derived with numpy."""
        rng = np.random.default_rng(3)
        S, per, C = 7, 50, 4
        keep = np.array([1, 0, 1, 1, 0, 0, 1])
        per_sec = rng.normal(size=(S, per, C)).astype(np.float32)

        f, p, g = second_groups(keep)
        T = int(keep.sum())
        got = pool_seconds_to_frames(
            jnp.asarray(per_sec), jnp.asarray(f), jnp.asarray(p), jnp.asarray(g), T
        )

        # numpy oracle: concatenate each group's blocks, adaptive-pool to 50
        def adaptive_pool(x, n_out):  # x [N, C]
            n_in = x.shape[0]
            out = np.zeros((n_out, x.shape[1]), np.float32)
            for i in range(n_out):
                a, b = (i * n_in) // n_out, -(-((i + 1) * n_in) // n_out)
                out[i] = x[a:b].mean(0)
            return out

        want = []
        idx = 0
        for t in range(T):
            grp = per_sec[idx : idx + g[t]].reshape(-1, C)
            want.append(adaptive_pool(grp, per))
            idx += g[t]
        want = np.stack(want)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_pool_invalid_seconds_masked(self):
        S, per, C = 4, 50, 2
        keep = np.array([1, 1, 1, 1])
        f, p, g = second_groups(keep)
        per_sec = jnp.ones((S, per, C))
        valid = jnp.array([True, True, False, False])
        out = pool_seconds_to_frames(
            per_sec, jnp.asarray(f), jnp.asarray(p), jnp.asarray(g), 4, sec_valid=valid
        )
        assert np.allclose(np.asarray(out[:2]), 1.0)
        assert np.allclose(np.asarray(out[2:]), 0.0)
