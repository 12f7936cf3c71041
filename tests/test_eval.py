"""Eval harness tests: letter extraction, SRT parsing, dataset adapters, and
a full tiny MLVU-style benchmark run through TDCPredictor."""

import json
import os

import numpy as np
import pytest

from tdc_video_tpu.eval.datasets import (
    fill_musicqa_template,
    load_mlvu,
    parse_srt,
    qa_template_mlvu,
    subtitles_for_frames,
)
from tdc_video_tpu.eval.runner import extract_letter


class TestExtractLetter:
    def test_paths(self):
        assert extract_letter("(B)") == "B"
        assert extract_letter("Answer: C.") == "C"
        assert extract_letter(" A ") == "A"
        assert extract_letter("The answer is [D]") == "D"
        assert extract_letter("nothing here") == "A"  # reference fallback
        assert extract_letter("(E)", ("A", "B", "C", "D")) == "C"  # invalid -> idx 2


class TestSRT:
    def test_parse_and_select(self, tmp_path):
        srt = """1
00:00:00,000 --> 00:00:02,500
hello world

2
00:00:03,000 --> 00:00:05,000
[Music]

3
00:00:05,500 --> 00:00:09,000
second line
"""
        p = tmp_path / "a.srt"
        p.write_text(srt)
        subs = parse_srt(str(p))
        assert len(subs) == 3
        assert subs[0]["text"] == "hello world"
        text = subtitles_for_frames(subs, [1.0, 4.0, 6.0])
        assert "hello world" in text and "second line" in text
        assert "[Music]" not in text


class TestTemplates:
    def test_mlvu_template(self):
        q, a = qa_template_mlvu(
            {
                "question": "What color?",
                "candidates": ["red", "blue", "green"],
                "answer": "blue",
            }
        )
        assert "(A) red" in q and "(B) blue" in q
        assert a == "B"
        assert q.startswith("Question: What color?")

    def test_musicqa_template(self):
        line = {
            "question_content": "Is the <Object> louder than the <Object>?",
            "templ_values": "[\"drum\", \"piano\"]",
        }
        assert fill_musicqa_template(line) == "Is the drum louder than the piano?"

    def test_load_mlvu(self, tmp_path):
        os.makedirs(tmp_path / "json")
        for jf, _ in [
            ("json/4_count.json", None),
            ("json/3_ego.json", None),
            ("json/2_needle.json", None),
            ("json/5_order.json", None),
            ("json/1_plotQA.json", None),
            ("json/6_anomaly_reco.json", None),
            ("json/7_topic_reasoning.json", None),
        ]:
            (tmp_path / jf).write_text(
                json.dumps(
                    [
                        {
                            "video": "v.mp4",
                            "question": "Q?",
                            "candidates": ["x", "y"],
                            "answer": "y",
                        }
                    ]
                )
            )
        samples = load_mlvu(str(tmp_path))
        assert len(samples) == 7
        assert samples[0]["answer"] == "B"
        assert samples[0]["letters"] == ["A", "B"]


class SimpleTokenizer:
    """Offline HF-like tokenizer: hash words to ids, decode to 'tok<i>'."""

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        import re

        specials = ["<|im_start|>", "<|im_end|>"]
        ids = []
        pat = "|".join(map(re.escape, specials)) + r"|\n"
        for piece in re.split(f"({pat})", text):
            if not piece:
                continue
            if piece == "<|im_start|>":
                ids.append(201)
            elif piece == "<|im_end|>":
                ids.append(202)
            elif piece == "\n":
                ids.append(198)
            else:
                ids.extend(100 + (hash(w) % 300) for w in piece.split(" ") if w)
        return self._Out(ids)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"tok{int(i)}" for i in ids)


@pytest.mark.slow
class TestPredictorEndToEnd:
    def test_mlvu_style_run(self, tmp_path):
        """Synthetic checkpoint + GIF videos through run_benchmark."""
        from PIL import Image

        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.eval.harness import run_benchmark
        from tdc_video_tpu.eval.runner import TDCPredictor
        from tdc_video_tpu.config import tdc_tiny
        from test_builder import write_checkpoint

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        _, model, _, _ = load_pretrained_model(ckpt, load_tokenizer=False)

        vid = str(tmp_path / "v.gif")
        ims = [Image.new("RGB", (64, 48), (i * 40, 10, 10)) for i in range(6)]
        ims[0].save(vid, save_all=True, append_images=ims[1:], duration=500, loop=0)

        predictor = TDCPredictor(
            model.cfg, model.params, SimpleTokenizer(), max_new_tokens=3,
            text_bucket=128,
        )
        samples = [
            {
                "task_type": "count",
                "video": vid,
                "video_name": "v.gif",
                "question": "How many?",
                "prompt": "Question: How many?\nOptions:\n(A) 1\n(B) 2\nRespond with only the letter.",
                "answer": "A",
                "letters": ["A", "B"],
            },
            {
                "task_type": "order",
                "video": vid,
                "video_name": "v.gif",
                "question": "Which first?",
                "prompt": "Question: Which first?\nOptions:\n(A) x\n(B) y\nRespond with only the letter.",
                "answer": "B",
                "letters": ["A", "B"],
            },
        ]
        metrics = run_benchmark("mlvu", predictor, samples, out_dir=str(tmp_path / "res"))
        assert "Acc" in metrics and "count" in metrics and "order" in metrics
        outs = os.listdir(tmp_path / "res" / "MLVU")
        assert any(f.startswith("outputs-") for f in outs)
        assert any(f.startswith("result-") for f in outs)
        # one compile key reused across both samples (same buckets)
        assert len(predictor._gen_cache) == 1


@pytest.mark.slow
class TestFeatureCacheKey:
    def test_distinct_videos_get_distinct_features(self, tmp_path):
        """Regression: the feature cache once keyed on id(frames); CPython
        reuses ids after GC, so a second same-shape video could be answered
        against the first video's features. Keys are now caller uids."""
        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.eval.runner import TDCPredictor
        from tdc_video_tpu.config import tdc_tiny
        from test_builder import write_checkpoint

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        _, model, _, _ = load_pretrained_model(ckpt, load_tokenizer=False)
        predictor = TDCPredictor(
            model.cfg, model.params, SimpleTokenizer(), max_new_tokens=2,
            text_bucket=128,
        )
        rng = np.random.default_rng(0)
        shape = (4, 48, 64, 3)
        va = rng.integers(0, 255, shape, np.uint8)
        vb = rng.integers(0, 255, shape, np.uint8)

        key_a = ("vid_a", va.shape, len(va))
        key_b = ("vid_b", vb.shape, len(vb))
        ff_a, *_ = predictor.encode_video(va, cache_key=key_a)
        # same-shape different video with a different uid: must re-encode
        ff_b, *_ = predictor.encode_video(vb, cache_key=key_b)
        assert not np.allclose(np.asarray(ff_a), np.asarray(ff_b))
        # same uid again: served from cache (identical object)
        ff_b2, *_ = predictor.encode_video(vb, cache_key=key_b)
        assert ff_b2 is ff_b
        # no uid: never cached
        ff_c, *_ = predictor.encode_video(vb, cache_key=None)
        assert predictor._feat_cache[0] == key_b


@pytest.mark.slow
class TestResume:
    def test_wal_resume_skips_answered(self, tmp_path):
        from PIL import Image

        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.eval.harness import run_benchmark
        from tdc_video_tpu.eval.runner import TDCPredictor
        from tdc_video_tpu.config import tdc_tiny
        from test_builder import write_checkpoint

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        _, model, _, _ = load_pretrained_model(ckpt, load_tokenizer=False)
        vid = str(tmp_path / "v.gif")
        ims = [Image.new("RGB", (64, 48), (i * 40, 10, 10)) for i in range(4)]
        ims[0].save(vid, save_all=True, append_images=ims[1:], duration=500, loop=0)
        predictor = TDCPredictor(
            model.cfg, model.params, SimpleTokenizer(), max_new_tokens=2, text_bucket=128
        )
        samples = [
            {
                "task_type": "count", "video": vid, "video_name": "v.gif",
                "question": "How many?", "prompt": "Q?\n(A) 1\n(B) 2",
                "answer": "A", "letters": ["A", "B"],
            }
        ]
        out = str(tmp_path / "res")
        m1 = run_benchmark("mlvu", predictor, samples, out_dir=out)
        # completed run GCs its WAL (outputs-*.json now owns the records):
        # a stale WAL must not seed a future run of the same out_dir
        wal = os.path.join(out, "MLVU", "wal-host0.jsonl")
        assert not os.path.exists(wal)

        # simulate a crash: a WAL with the answered record but no outputs —
        # the resumed run must skip the answered sample
        import json as _json

        rec = {
            "task_type": "count", "video_name": "v.gif", "question": "How many?",
            "pred": "A", "answer": "A",
        }
        with open(wal, "w") as fh:
            fh.write(_json.dumps(rec) + "\n")
        n_before = predictor.stats.samples
        m2 = run_benchmark("mlvu", predictor, samples, out_dir=out)
        assert predictor.stats.samples == n_before  # nothing re-answered
        assert m1 == m2


@pytest.mark.slow
class TestActivationDiff:
    def test_dump_and_self_diff(self, tmp_path):
        """cli/activation_diff: dump per-stage activations for a synthetic
        checkpoint + MPEG-4 fixture, then self-diff must be exact."""
        from tdc_video_tpu.cli.activation_diff import main
        from tdc_video_tpu.config import tdc_tiny
        from tdc_video_tpu.media.io import encode_test_video
        from test_builder import write_checkpoint

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        vid = str(tmp_path / "v.mp4")
        encode_test_video(vid, 160, 120, fps=25.0, n_frames=100)
        out = str(tmp_path / "a.npz")
        assert main(["dump", "--model_path", ckpt, "--video", vid, "--out", out]) == 0
        import numpy as _np

        z = _np.load(out)
        for k in ("siglip_feats", "dino_feats", "frame_feats", "boundaries", "visual"):
            assert k in z.files
        assert main(["diff", out, out]) == 0


@pytest.mark.slow
class TestAnswerMany:
    def test_multi_question_engine_matches_solo(self, tmp_path):
        """answer_many routes N questions through the continuous-batching
        DecodeEngine; greedy answers must match the single-question path."""
        import numpy as np

        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.eval.runner import TDCPredictor
        from tdc_video_tpu.config import tdc_tiny
        from test_builder import write_checkpoint

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        _, model, _, _ = load_pretrained_model(ckpt, load_tokenizer=False)

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (5, 48, 64, 3)).astype(np.uint8)
        questions = ["How many objects?", "What color dominates?", "What happens last?"]

        predictor = TDCPredictor(
            model.cfg, model.params, SimpleTokenizer(), max_new_tokens=4,
            text_bucket=128,
        )
        batched = predictor.answer_many(
            frames, questions, video_uid="v1", num_slots=2
        )
        solo = [
            predictor.answer(frames, q, video_uid="v1") for q in questions
        ]
        assert batched == solo

        # shared-prefix admission: the common [template head + video tokens]
        # embed prefix prefills once, each question extends its own suffix —
        # answers must be unchanged (threshold 1 forces sharing on at tiny
        # prompt sizes).  Engines are cached per compile shape (reset+reused
        # across calls), so inspect the cached instance, not constructions.
        shared = predictor.answer_many(
            frames, questions, video_uid="v1", num_slots=2,
            prefix_share_threshold=1,
        )
        assert shared == solo
        engines = list(predictor._engine_cache.values())
        assert len(engines) == 1  # same compile shape both calls -> one engine
        assert engines[0].prefix_prefills == 1  # counters are per-run (reset)

    def test_engine_reused_across_videos(self, tmp_path):
        """answer_many reuses one DecodeEngine per compile shape across
        videos (its jitted kernels are instance-bound, so a fresh engine per
        call would recompile for every video); the reused engine must give
        the same answers as a fresh predictor."""
        import numpy as np

        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.eval.runner import TDCPredictor
        from tdc_video_tpu.config import tdc_tiny
        from test_builder import write_checkpoint

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        _, model, _, _ = load_pretrained_model(ckpt, load_tokenizer=False)

        rng = np.random.default_rng(7)
        vids = [
            rng.integers(0, 255, (5, 48, 64, 3)).astype(np.uint8)
            for _ in range(2)
        ]
        questions = ["How many objects?", "What color dominates?"]

        def make():
            return TDCPredictor(
                model.cfg, model.params, SimpleTokenizer(), max_new_tokens=4,
                text_bucket=128,
            )

        warm = make()
        reused = [
            warm.answer_many(v, questions, video_uid=f"v{i}", num_slots=2)
            for i, v in enumerate(vids)
        ]
        # one engine, reused (same frame/text/capacity buckets both calls)
        assert len(warm._engine_cache) == 1

        fresh = [
            make().answer_many(v, questions, video_uid=f"v{i}", num_slots=2)
            for i, v in enumerate(vids)
        ]
        assert reused == fresh
        # the two videos genuinely exercise different content through the
        # same engine (identical answers would make reuse vacuous)
        assert vids[0].tobytes() != vids[1].tobytes()

    def test_engine_cache_is_bounded_lru(self, tmp_path):
        """Each cached engine pins a num_slots x capacity KV cache in HBM,
        so the cache must stay bounded (2 most-recently-used compile shapes)
        and evict oldest-first — an unbounded cache converges on OOM over a
        long eval with varying prompt/slot shapes."""
        import numpy as np

        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.eval.runner import TDCPredictor
        from tdc_video_tpu.config import tdc_tiny
        from test_builder import write_checkpoint

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        _, model, _, _ = load_pretrained_model(ckpt, load_tokenizer=False)

        rng = np.random.default_rng(3)
        v = rng.integers(0, 255, (5, 48, 64, 3)).astype(np.uint8)
        questions = ["How many objects?", "What color dominates?"]

        p = TDCPredictor(model.cfg, model.params, SimpleTokenizer(),
                         max_new_tokens=4, text_bucket=128)
        # three distinct compile shapes: (2 slots, bf16), (2 slots, int8 KV),
        # (1 slot, bf16) — each would be a new engine
        p.answer_many(v, questions, video_uid="v", num_slots=2)
        key_a = next(iter(p._engine_cache))
        p.answer_many(v, questions, video_uid="v", num_slots=2,
                      kv_quant="int8")
        p.answer_many(v, questions[:1], video_uid="v", num_slots=1)
        assert len(p._engine_cache) == 2
        assert key_a not in p._engine_cache  # oldest evicted
        # a hit refreshes recency: touch the int8 engine, add a new shape,
        # and the 1-slot engine (now oldest) is the one evicted
        p.answer_many(v, questions, video_uid="v", num_slots=2,
                      kv_quant="int8")
        keys = list(p._engine_cache)
        p.answer_many(v, questions, video_uid="v", num_slots=2)
        assert keys[-1] in p._engine_cache  # the touched int8 engine survives
        assert len(p._engine_cache) == 2

    def test_grouped_harness_batch_slots(self, tmp_path):
        """--batch_slots routes a grouped (Video-MME-style) video's questions
        through answer_many; records must match the per-question path,
        including the distinct (prompt, qformer_prompt) split."""
        from PIL import Image

        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.eval.harness import run_benchmark
        from tdc_video_tpu.eval.runner import TDCPredictor
        from tdc_video_tpu.config import tdc_tiny
        from test_builder import write_checkpoint

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        _, model, _, _ = load_pretrained_model(ckpt, load_tokenizer=False)

        vid = str(tmp_path / "v.gif")
        ims = [Image.new("RGB", (64, 48), (i * 40, 10, 10)) for i in range(6)]
        ims[0].save(vid, save_all=True, append_images=ims[1:], duration=500, loop=0)

        def grouped():
            return [{
                "video": vid,
                "video_name": "v.gif",
                "prompt": "",
                "duration": "short",
                "questions": [
                    {"question": "How many?", "choices": ["(A) 1", "(B) 2"], "answer": "A"},
                    {"question": "Which first?", "choices": ["(A) x", "(B) y"], "answer": "B"},
                    {"question": "What color?", "choices": ["(A) r", "(B) g"], "answer": "A"},
                ],
            }]

        def run(slots, sub):
            import glob as _glob

            predictor = TDCPredictor(
                model.cfg, model.params, SimpleTokenizer(), max_new_tokens=3,
                text_bucket=128,
            )
            run_benchmark("videomme", predictor, grouped(),
                          out_dir=str(tmp_path / sub), batch_slots=slots)
            out = _glob.glob(str(tmp_path / sub / "VIDEOMME" / "outputs-*.json"))
            with open(out[0]) as fh:
                return {r["question"]: (r["raw"], r["pred"]) for r in json.load(fh)}

        assert run(2, "batched") == run(0, "solo")


class TestGroupByVideo:
    """Grouped admission for every benchmark (round-5): flat per-question
    samples sharing one video fold into a single group so the harness decodes
    + encodes once and can batch the questions through one engine call."""

    def _flat(self, video, q, bound=None, **kw):
        s = {
            "task_type": "count", "video": video, "video_name": video,
            "question": q, "prompt": f"Question: {q}\n(A) x\n(B) y",
            "answer": "A", "letters": ["A", "B"],
        }
        if bound is not None:
            s["bound"] = bound
        s.update(kw)
        return s

    def test_groups_share_video(self):
        from tdc_video_tpu.eval.datasets import group_by_video

        samples = [
            self._flat("a.mp4", "q1"),
            self._flat("b.mp4", "q2"),
            self._flat("a.mp4", "q3"),
        ]
        groups = group_by_video(samples)
        assert [g["video"] for g in groups] == ["a.mp4", "b.mp4"]
        assert [q["question"] for q in groups[0]["questions"]] == ["q1", "q3"]
        # per-question dicts pass through intact (record parity depends on it)
        assert groups[0]["questions"][0] is samples[0]

    def test_distinct_bounds_do_not_group(self):
        """MVBench bounded tasks view different spans of one file: different
        visual content, so they must encode separately."""
        from tdc_video_tpu.eval.datasets import group_by_video

        samples = [
            self._flat("a.mp4", "q1", bound=(0, 5)),
            self._flat("a.mp4", "q2", bound=(5, 10)),
            self._flat("a.mp4", "q3", bound=(0, 5)),
        ]
        groups = group_by_video(samples)
        assert len(groups) == 2
        assert len(groups[0]["questions"]) == 2

    def test_videomme_groups_normalize(self):
        """Pre-grouped Video-MME samples pass through with their raw-choices
        questions normalized into the flat prompt schema (and inherit the
        duration bucket as task_type, eval_videomme.py:241-260)."""
        from tdc_video_tpu.eval.datasets import group_by_video

        g = {
            "video": "v.mp4", "video_name": "v", "duration": "short",
            "questions": [
                {"question": "How many?", "choices": ["A. 1", "B. 2"], "answer": "A"},
            ],
        }
        out = group_by_video([g])
        assert len(out) == 1
        q = out[0]["questions"][0]
        assert q["prompt"].startswith("Question: How many?\nOptions:\nA. 1\nB. 2")
        assert q["task_type"] == "short"
        assert q["answer"] == "A"


@pytest.mark.slow
class TestGroupedHarness:
    def _setup(self, tmp_path, n_vids=2):
        from PIL import Image

        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.config import tdc_tiny
        from test_builder import write_checkpoint

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        _, model, _, _ = load_pretrained_model(ckpt, load_tokenizer=False)
        vids = []
        for v in range(n_vids):
            vid = str(tmp_path / f"v{v}.gif")
            ims = [
                Image.new("RGB", (64, 48), ((i + v) * 37 % 255, 10 + v * 60, 10))
                for i in range(5)
            ]
            ims[0].save(vid, save_all=True, append_images=ims[1:], duration=500, loop=0)
            vids.append(vid)
        return model, vids

    def _samples(self, vids):
        out = []
        qs = ["How many?", "Which first?", "What color?"]
        for v, vid in enumerate(vids):
            for i, q in enumerate(qs[: 3 - v]):
                out.append({
                    "task_type": "count" if i % 2 == 0 else "order",
                    "video": vid, "video_name": os.path.basename(vid),
                    "question": q,
                    "prompt": f"Question: {q}\nOptions:\n(A) x\n(B) y\nRespond with only the letter.",
                    "answer": "A" if i % 2 == 0 else "B",
                    "letters": ["A", "B"],
                })
        return out

    def _run(self, model, samples, out_dir, slots):
        import glob as _glob

        from tdc_video_tpu.eval.harness import run_benchmark
        from tdc_video_tpu.eval.runner import TDCPredictor

        predictor = TDCPredictor(
            model.cfg, model.params, SimpleTokenizer(), max_new_tokens=3,
            text_bucket=128,
        )
        metrics = run_benchmark("mlvu", predictor, samples, out_dir=out_dir,
                                batch_slots=slots)
        files = _glob.glob(os.path.join(out_dir, "MLVU", "outputs-*.json"))
        with open(files[0]) as fh:
            recs = json.load(fh)
        return predictor, metrics, sorted(recs, key=lambda r: (r["video_name"], r["question"]))

    def test_flat_benchmark_batches_per_video(self, tmp_path):
        """MLVU-style flat samples take the grouped engine path under
        --batch_slots, with records identical to the one-at-a-time path and
        one tower encode per video (VERDICT r4 #1)."""
        model, vids = self._setup(tmp_path)
        samples = self._samples(vids)  # 3 + 2 questions over 2 videos

        p_solo, m_solo, r_solo = self._run(model, samples, str(tmp_path / "solo"), 0)
        p_bat, m_bat, r_bat = self._run(model, samples, str(tmp_path / "bat"), 2)
        assert r_bat == r_solo
        assert m_bat == m_solo
        # the batched run took the engine path (answer() never called) and
        # encoded each video once (feature cache hits within the group)
        assert p_bat.stats.samples == 0
        assert len(p_bat._engine_cache) >= 1

    def test_mid_group_engine_failure_falls_back(self, tmp_path, monkeypatch):
        """A mid-group failure inside answer_many must not strand the group's
        questions, corrupt the WAL, or poison the engine for the next video
        (VERDICT r4 #8): the harness falls back to per-question decoding for
        that video and continues."""
        from tdc_video_tpu.eval.harness import run_benchmark
        from tdc_video_tpu.eval.runner import TDCPredictor

        model, vids = self._setup(tmp_path)
        samples = self._samples(vids)
        _, _, r_solo = self._run(model, samples, str(tmp_path / "solo"), 0)

        predictor = TDCPredictor(
            model.cfg, model.params, SimpleTokenizer(), max_new_tokens=3,
            text_bucket=128,
        )
        real = predictor.answer_many
        state = {"calls": 0}

        def flaky(*a, **kw):
            state["calls"] += 1
            if state["calls"] == 1:
                raise RuntimeError("injected mid-group failure")
            return real(*a, **kw)

        monkeypatch.setattr(predictor, "answer_many", flaky)
        out = str(tmp_path / "flaky")
        with pytest.warns(RuntimeWarning, match="answer_many failed"):
            run_benchmark("mlvu", predictor, samples, out_dir=out, batch_slots=2)
        import glob as _glob

        files = _glob.glob(os.path.join(out, "MLVU", "outputs-*.json"))
        with open(files[0]) as fh:
            recs = sorted(json.load(fh), key=lambda r: (r["video_name"], r["question"]))
        assert recs == r_solo  # every question answered, none stranded
        assert state["calls"] == 2  # second video still took the engine path
        # completed run GC'd its WAL (no torn state left behind)
        assert not os.path.exists(os.path.join(out, "MLVU", "wal-host0.jsonl"))

    def test_missing_video_skips_group_only(self, tmp_path):
        """A missing/corrupt video skips its own group; later videos still
        run and the benchmark completes (reference behavior for unreadable
        rows, eval_mlvu.py:182-184)."""
        model, vids = self._setup(tmp_path)
        samples = self._samples(vids)
        # point the first video's group at a nonexistent file
        for s in samples:
            if s["video"] == vids[0]:
                s["video"] = str(tmp_path / "gone.mp4")
        _, metrics, recs = self._run(model, samples, str(tmp_path / "skip"), 2)
        # only the second video's questions were answered
        assert {r["video_name"] for r in recs} == {os.path.basename(vids[1])}
        assert len(recs) == 2
