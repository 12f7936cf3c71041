"""Streaming runtime tests: chunked overlap encode must produce the same
compressed tokens as the monolithic path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import tdc_tiny
from tdc_video_tpu.model import encode_frames, init_tdc, prepare_visual
from tdc_video_tpu.serving.streaming import StreamingEncoder


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    from PIL import Image

    p = tmp_path_factory.mktemp("vid") / "c.gif"
    ims = [
        Image.new("RGB", (60, 40), ((i * 37) % 255, 30, 255 - (i * 31) % 255))
        for i in range(14)
    ]
    ims[0].save(str(p), save_all=True, append_images=ims[1:], duration=1000, loop=0)
    return str(p)


@pytest.mark.slow
def test_streaming_matches_monolithic(clip):
    cfg = tdc_tiny()
    params = init_tdc(jax.random.PRNGKey(0), cfg)
    enc = StreamingEncoder(cfg, params, chunk_frames=4, max_frames=100, device_prep=False)
    ff, df, mask, ts, stats = enc.encode_stream(clip)
    # 14 frames at 1 fps, chunked by 4 -> padded to 16
    assert stats.frames == 14
    assert ff.shape[0] == 16 and int(mask.sum()) == 14
    assert stats.wall_s > 0 and stats.summary()["video_sec_per_sec"] > 0

    visual, n_visual, _ = enc.compress(ff, df, mask)

    # monolithic oracle over the same decoded frames
    from tdc_video_tpu.data.images import process_frames
    from tdc_video_tpu.media.io import decode_video

    frames, _ = decode_video(clip, fps=1.0, max_frames=100)
    sig, dino = process_frames(list(frames), cfg)
    pad = 16 - len(frames)
    sig = np.concatenate([sig, np.zeros((pad,) + sig.shape[1:], sig.dtype)])
    dino = np.concatenate([dino, np.zeros((pad,) + dino.shape[1:], dino.dtype)])
    ff2, df2 = encode_frames(cfg, params, jnp.asarray(sig), jnp.asarray(dino))
    v2, n2 = prepare_visual(
        cfg, params, ff2, df2, mask,
        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.bool_),
        max_visual_len=4096,
    )
    assert int(n_visual) == int(n2)
    # bf16 compression (config.compress_dtype) amplifies the chunked-vs-batch
    # tower reduction-order noise to ~bf16 epsilon; f32 used to sit at 2e-4
    np.testing.assert_allclose(
        np.asarray(visual[: int(n_visual)]),
        np.asarray(v2[: int(n2)]),
        rtol=1e-2,
        atol=1e-2,
    )

    # device-preprocess path: same shapes/counts, numerics tracked by
    # tests/test_data.py::TestDevicePreprocess
    enc_d = StreamingEncoder(cfg, params, chunk_frames=4, max_frames=100, device_prep=True)
    ffd, dfd, md, tsd, std_ = enc_d.encode_stream(clip)
    assert ffd.shape == ff.shape and int(md.sum()) == 14
    vd, nd, _ = enc_d.compress(ffd, dfd, md)
    assert int(nd) == int(n_visual)
