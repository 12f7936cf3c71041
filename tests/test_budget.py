"""Token-budget bookkeeping (compress/budget.py) vs the reference's
get_max_num_frames (tdc/cambrian_arch.py:748-780)."""

import dataclasses

from tdc_video_tpu import config as C
from tdc_video_tpu.compress.budget import max_num_frames, tokens_per_frame


def test_flagship_tokens_per_frame_parity():
    """The reference hardcodes static=144 (+50 audio) at
    cambrian_arch.py:766-768: flagship (K=16, chunk 8) amortizes to 32,
    38 with audio."""
    assert tokens_per_frame(C.tdc_qwen2_7b()) == 32
    assert tokens_per_frame(C.tdc_qwen2_7b(audio=True)) == 38


def test_static_term_follows_sva_grid():
    """A non-144 video grid budgets from its own configured grid instead of
    the reference's hardcoded constant."""
    cfg = C.tdc_qwen2_7b()
    lowres = dataclasses.replace(
        cfg, sva=dataclasses.replace(cfg.sva, image_token_len=16)
    )
    c = cfg.compression
    expect = (16 + c.context_token_num * (c.chunk_size - 1)) // c.chunk_size
    assert tokens_per_frame(lowres) == expect


def test_no_static_uses_context_tokens():
    cfg = C.tdc_qwen2_7b()
    cfg = dataclasses.replace(
        cfg, compression=dataclasses.replace(cfg.compression, add_static=False)
    )
    assert tokens_per_frame(cfg) == cfg.compression.context_token_num


def test_max_num_frames_clamps():
    cfg = C.tdc_qwen2_7b()
    ids = [5] * 64  # no pad: text length 64
    n = max_num_frames(cfg, ids, train=True)
    assert 1 <= n <= cfg.compression.max_train_frames
