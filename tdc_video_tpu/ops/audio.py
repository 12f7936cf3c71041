"""Audio front end: Kaldi-compatible log-mel filterbanks + audio/frame alignment.

TPU-native replacement for the reference's torchaudio kaldi fbank call
(reference tdc/audio_models/beats/BEATs.py:116-131: 128 mel bins, 16 kHz,
25 ms window / 10 ms shift, waveform scaled by 2**15) and the per-second
audio-token alignment loop (reference tdc/cambrian_arch.py:1547-1598).

The fbank is a jittable pipeline of static-shape ops: strided framing
(gather), DC removal, pre-emphasis, Povey window, rFFT-512 power spectrum and
one [257 x 128] mel matmul.  Computed in f32 — the reference pins BEATs
preprocessing to full precision (BEATs.py:139).

Alignment redesign: the reference accumulates per-second 50-token blocks in a
Python loop and adaptive-avg-pools the blocks belonging to dropped frames into
the surviving frame (cambrian_arch.py:1562-1589).  Here each audio second
carries a precomputed (frame id, group position, group size); every one of its
50 tokens maps to an output (frame, bin) cell via the same concatenate-then-
adaptive-pool arithmetic, and ONE scatter-add produces [T, 50, 768].
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import (
    AUDIO_SAMPLE_RATE,
    AUDIO_TOKENS_PER_SECOND,
    AUDIO_WINDOW_SECONDS,
)
from .pooling import adaptive_avg_pool_tokens

# Kaldi fbank constants for 16 kHz / 25 ms / 10 ms (torchaudio compliance
# defaults used by the reference call).
WINDOW_SIZE = 400
WINDOW_SHIFT = 160
PADDED_WINDOW = 512  # round_to_power_of_two
NUM_MEL_BINS = 128
LOW_FREQ = 20.0
PREEMPHASIS = 0.97
EPSILON = 1.1920928955078125e-07  # kaldi float epsilon


def num_fbank_frames(n_samples: int) -> int:
    """snip_edges=True frame count."""
    if n_samples < WINDOW_SIZE:
        return 0
    return 1 + (n_samples - WINDOW_SIZE) // WINDOW_SHIFT


@functools.lru_cache(maxsize=4)
def _povey_window() -> np.ndarray:
    n = np.arange(WINDOW_SIZE, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * math.pi * n / (WINDOW_SIZE - 1))
    return (hann**0.85).astype(np.float32)


def _mel(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@functools.lru_cache(maxsize=4)
def mel_banks(sample_rate: int = AUDIO_SAMPLE_RATE) -> np.ndarray:
    """[PADDED_WINDOW//2 + 1, NUM_MEL_BINS] triangular mel weights (kaldi
    get_mel_banks; high_freq = nyquist, low_freq = 20 Hz)."""
    num_fft_bins = PADDED_WINDOW // 2
    nyquist = 0.5 * sample_rate
    mel_low = _mel(LOW_FREQ)
    mel_high = _mel(nyquist)
    delta = (mel_high - mel_low) / (NUM_MEL_BINS + 1)
    fft_bin_width = sample_rate / PADDED_WINDOW
    mel_of_bin = _mel(fft_bin_width * np.arange(num_fft_bins, dtype=np.float64))

    left = mel_low + np.arange(NUM_MEL_BINS)[:, None] * delta
    center = left + delta
    right = center + delta
    up = (mel_of_bin[None, :] - left) / delta
    down = (right - mel_of_bin[None, :]) / delta
    weights = np.maximum(0.0, np.minimum(up, down))  # [128, 256]
    out = np.zeros((NUM_MEL_BINS, num_fft_bins + 1), np.float32)
    out[:, :num_fft_bins] = weights
    return out.T.copy()  # [257, 128]


def kaldi_fbank(wav: jnp.ndarray) -> jnp.ndarray:
    """[B, N] f32 waveform in [-1, 1] -> [B, frames, 128] log-mel (f32).

    Matches torchaudio.compliance.kaldi.fbank with the reference's arguments
    (dither=0, remove_dc_offset, preemphasis 0.97, povey window, use_power,
    use_log_fbank), including the reference's 2**15 input scaling.
    """
    wav = wav.astype(jnp.float32) * 32768.0
    B, N = wav.shape
    F = num_fbank_frames(N)
    starts = jnp.arange(F) * WINDOW_SHIFT
    idx = starts[:, None] + jnp.arange(WINDOW_SIZE)[None, :]
    frames = wav[:, idx]  # [B, F, 400]

    frames = frames - frames.mean(axis=-1, keepdims=True)  # remove_dc_offset
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - PREEMPHASIS * prev
    frames = frames * jnp.asarray(_povey_window())

    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, PADDED_WINDOW - WINDOW_SIZE)))
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # [B, F, 257]
    mel = power @ jnp.asarray(mel_banks())  # [B, F, 128]
    return jnp.log(jnp.maximum(mel, EPSILON))


def normalize_fbank(fbank: jnp.ndarray, mean: float, std: float) -> jnp.ndarray:
    """BEATs input normalization (BEATs.py:128-130): (x - mean) / (2 * std)."""
    return (fbank - mean) / (2.0 * std)


# ---------------------------------------------------------------------------
# Per-second token slicing (reference cambrian_arch.py:1552-1568)
# ---------------------------------------------------------------------------


def window_to_seconds(tokens: jnp.ndarray, seconds: int = AUDIO_WINDOW_SECONDS) -> jnp.ndarray:
    """[B, Twin, C] BEATs tokens of one `seconds`-long window -> [B, seconds, 50, C].

    The reference slices [k*50:(k+1)*50] per second and adaptive-avg-pools any
    short final slice back to 50 (cambrian_arch.py:1563-1568); a 10-s window
    yields 496 tokens so second 9 holds 46 tokens pooled to 50.
    """
    B, T, C = tokens.shape
    per = AUDIO_TOKENS_PER_SECOND
    out = []
    for s in range(seconds):
        sl = tokens[:, s * per : (s + 1) * per]
        if sl.shape[1] == 0:
            sl = jnp.zeros((B, per, C), tokens.dtype)
        elif sl.shape[1] != per:
            sl = adaptive_avg_pool_tokens(sl, per)
        out.append(sl)
    return jnp.stack(out, axis=1)


# ---------------------------------------------------------------------------
# Audio -> sampled-frame pooling (reference cambrian_arch.py:1562-1589)
# ---------------------------------------------------------------------------


def second_groups(sample_indices: np.ndarray):
    """Host-side: per-second (frame_id, group_pos) + per-frame group_size.

    `sample_indices` is the reference's keep bitmap over source seconds
    (tdc/train.py:414-423): 1 = this second's frame survived uniform
    resampling.  A surviving frame's audio group = its own second plus the
    following dropped seconds.  Leading dropped seconds (before the first kept
    frame) pool into frame 0, matching the reference's flush-on-next-kept
    accumulation.
    """
    s = np.asarray(sample_indices).astype(np.int64)
    S = s.shape[0]
    frame_of_sec = np.maximum(np.cumsum(s) - 1, 0)
    T = int(s.sum()) if s.sum() > 0 else 1
    group_size = np.bincount(frame_of_sec, minlength=T).astype(np.int32)
    group_pos = np.zeros(S, np.int32)
    run = {}
    for i in range(S):
        f = frame_of_sec[i]
        group_pos[i] = run.get(f, 0)
        run[f] = group_pos[i] + 1
    return frame_of_sec.astype(np.int32), group_pos, group_size


def pool_seconds_to_frames(
    per_sec: jnp.ndarray,  # [S, 50, C] per-second audio tokens
    frame_of_sec: jnp.ndarray,  # [S] int32 output frame per second
    group_pos: jnp.ndarray,  # [S] int32 position of the second within its group
    group_size: jnp.ndarray,  # [T] int32 seconds pooled into each frame
    num_frames: int,
    sec_valid: jnp.ndarray = None,  # [S] bool
) -> jnp.ndarray:
    """Returns [num_frames, 50, C].

    Replicates adaptive_avg_pool2d over the concatenated group
    (cambrian_arch.py:1571-1573): a group of g seconds concatenates to 50*g
    rows and pools to 50 bins of g consecutive rows, so row (p*50 + r) of the
    concatenation lands in bin (p*50 + r) // g.  One scatter-add, no loops.
    """
    S, per, C = per_sec.shape
    g = group_size[jnp.clip(frame_of_sec, 0, num_frames - 1)]  # [S]
    r = jnp.arange(per)[None, :]  # [1, 50]
    row = group_pos[:, None] * per + r  # [S, 50]
    bin_idx = row // jnp.maximum(g[:, None], 1)  # [S, 50]
    frame_idx = jnp.broadcast_to(frame_of_sec[:, None], (S, per))

    valid = jnp.ones((S,), jnp.bool_) if sec_valid is None else sec_valid
    w = jnp.where(valid, 1.0 / jnp.maximum(g, 1).astype(jnp.float32), 0.0)  # [S]
    contrib = per_sec.astype(jnp.float32) * w[:, None, None]

    frame_idx = jnp.where(valid[:, None], frame_idx, num_frames)
    bin_idx = jnp.clip(bin_idx, 0, per - 1)
    out = jnp.zeros((num_frames + 1, per, C), jnp.float32)
    out = out.at[frame_idx.reshape(-1), bin_idx.reshape(-1)].add(contrib.reshape(S * per, C))
    return out[:num_frames].astype(per_sec.dtype)
