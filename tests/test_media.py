"""Native media decoder tests.

Test media is synthesized on the fly (animated GIF via PIL, PCM WAV via the
stdlib) — both containers FFmpeg demuxes — so the 1-fps sampling, scaling,
and 16 kHz mono resampling paths run for real without checked-in blobs.
"""

import math
import os
import wave

import numpy as np
import pytest

from tdc_video_tpu.media.io import decode_video, load_audio, probe, window_audio


@pytest.fixture(scope="module")
def gif_path(tmp_path_factory):
    """12-frame 2-fps GIF, 80x48, frame i filled with value i*20."""
    from PIL import Image

    path = tmp_path_factory.mktemp("media") / "clip.gif"
    frames = [
        Image.new("RGB", (80, 48), (i * 20, i * 10, 255 - i * 20)) for i in range(12)
    ]
    frames[0].save(
        str(path), save_all=True, append_images=frames[1:], duration=500, loop=0
    )
    return str(path)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    """3-s stereo 44.1 kHz sine (440 Hz left, 880 Hz right)."""
    path = tmp_path_factory.mktemp("media") / "tone.wav"
    sr = 44100
    t = np.arange(3 * sr) / sr
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    right = 0.5 * np.sin(2 * np.pi * 880 * t)
    pcm = (np.stack([left, right], 1) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return str(path)


class TestVideo:
    def test_probe(self, gif_path):
        info = probe(gif_path)
        assert info["width"] == 80 and info["height"] == 48
        assert not info["has_audio"]

    def test_one_fps_sampling(self, gif_path):
        # 12 frames at 2 fps = 6 s of video -> 6 frames at 1 fps
        frames, ts = decode_video(gif_path, fps=1.0, max_dim=64)
        assert frames.shape[0] == 6
        assert frames.shape[3] == 3
        # aspect preserved: longer side == 64
        assert max(frames.shape[1], frames.shape[2]) == 64
        # timestamps ~ 0,1,2,...
        assert np.allclose(ts, np.arange(6), atol=0.3)
        # frame content advances (red channel grows by ~40/video-second)
        reds = frames[:, 4, 4, 0].astype(int)
        assert all(b - a > 20 for a, b in zip(reds, reds[1:])), reds

    def test_all_frames(self, gif_path):
        frames, _ = decode_video(gif_path, fps=2.0, max_dim=64)
        assert frames.shape[0] == 12

    def test_max_frames_cap(self, gif_path):
        frames, _ = decode_video(gif_path, fps=2.0, max_dim=64, max_frames=5)
        assert frames.shape[0] == 5

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            decode_video("/nonexistent.mp4")


class TestAudio:
    def test_resample_mono(self, wav_path):
        wav = load_audio(wav_path)
        assert wav is not None and wav.dtype == np.float32
        # 3 s at 16 kHz
        assert abs(len(wav) - 48000) < 200
        # downmixed tone keeps both fundamentals: check dominant bins
        spec = np.abs(np.fft.rfft(wav[:16000]))
        freqs = np.fft.rfftfreq(16000, 1 / 16000)
        top = freqs[np.argsort(spec)[-4:]]
        assert any(abs(f - 440) < 5 for f in top), top
        assert any(abs(f - 880) < 5 for f in top), top

    def test_no_audio_in_gif(self, gif_path):
        assert load_audio(gif_path) is None

    def test_window_audio(self):
        wav = np.ones(16000 * 13, np.float32)
        windows, mask = window_audio(wav)
        assert windows.shape == (2, 160000)
        assert mask[0].all() and mask[1].sum() == 3 * 16000


class TestSegmentParallelDecode:
    """Segment-parallel seek decode (tdc_decode_video_mt) vs the sequential
    decoder on a real seekable MPEG-4 fixture (encode_test_video — frame k is
    flat RGB(k%256, 3k%256, 64), so content identifies the source frame)."""

    @pytest.fixture(scope="class")
    def mp4_path(self, tmp_path_factory):
        from tdc_video_tpu.media.io import encode_test_video

        p = str(tmp_path_factory.mktemp("mt") / "fixture.mp4")
        encode_test_video(p, 160, 120, fps=25.0, n_frames=250)  # 10 s
        return p

    def test_mt_matches_sequential(self, mp4_path):
        from tdc_video_tpu.media.io import decode_video

        f1, t1 = decode_video(mp4_path, fps=1.0, threads=1)
        f4, t4 = decode_video(mp4_path, fps=1.0, threads=4)
        assert f1.shape == f4.shape
        np.testing.assert_allclose(t1, t4)
        # lossy codec: compare mean per-frame pixel difference, not bits
        for a, b in zip(f1, f4):
            assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0

    def test_frame_identity(self, mp4_path):
        """Source R channel is k%256 (k=0..225 over 10 s): decoded per-second
        means must be strictly increasing — workers did not scramble order.
        (Absolute values shift with the codec's limited-range YUV transform.)"""
        from tdc_video_tpu.media.io import decode_video

        f, t = decode_video(mp4_path, fps=1.0, threads=4)
        means = [float(fr[:, :, 0].mean()) for fr in f]
        assert all(b > a for a, b in zip(means, means[1:])), means

    def test_fast_flag(self, mp4_path):
        from tdc_video_tpu.media.io import decode_video

        f, t = decode_video(mp4_path, fps=1.0, threads=1, fast=True)
        f0, _ = decode_video(mp4_path, fps=1.0, threads=1)
        assert f.shape == f0.shape
        assert np.abs(f.astype(int) - f0.astype(int)).mean() < 3.0

    def test_gif_falls_back(self, tmp_path):
        """GIF has no reliable duration: mt path returns a fallback rc and the
        wrapper silently uses the sequential decoder."""
        from PIL import Image

        from tdc_video_tpu.media.io import decode_video

        p = str(tmp_path / "v.gif")
        ims = [Image.new("RGB", (64, 48), (i * 40, 10, 10)) for i in range(5)]
        ims[0].save(p, save_all=True, append_images=ims[1:], duration=400, loop=0)
        f, t = decode_video(p, fps=1.0, threads=4)
        assert len(f) >= 1
