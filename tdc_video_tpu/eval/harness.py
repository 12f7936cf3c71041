"""Benchmark harness: load model -> shard -> predict -> aggregate -> dump.

One runner covers all 7 reference harnesses (eval/eval_*.py); benchmark
differences (subtitles, audio, frame-dir videos, Kaggle CSV, free-form
answers) are data-driven from the sample dicts.

CLI (reference: torchrun --nproc_per_node=8 eval/eval_mlvu.py ...,
eval/README.md:8):

    python -m tdc_video_tpu.eval.harness mlvu \
        --model_path checkpoints/TDC-Qwen2-7B --data_path /data/MLVU
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import time
from typing import List, Optional

import numpy as np

from .datasets import LOADERS, group_by_video, parse_srt, subtitles_for_frames
from .runner import (
    TDCPredictor,
    accuracy_by_task,
    allgather_records,
    dump_results,
    extract_letter,
    lvcot,
    shard_samples,
)


def load_frame_dir(path: str, bound=None, sample_fps: float = 1.0) -> np.ndarray:
    """MVBench episodic-reasoning videos ship as 3-fps frame dirs
    (eval_mvbench.py tvqa/frames_fps3_hq)."""
    from PIL import Image

    files = sorted(glob.glob(os.path.join(path, "*.jpg")))
    if bound and bound[0] is not None:
        fps = 3.0
        lo, hi = int(bound[0] * fps), int(bound[1] * fps) + 1
        files = files[lo:hi]
    files = files[:: max(1, int(3 / sample_fps))]
    return np.stack([np.asarray(Image.open(f).convert("RGB")) for f in files])


def _build_record(line: dict, q: dict, pred: str) -> dict:
    """One per-question result record — shared by the grouped (answer_many)
    and one-at-a-time paths so both emit byte-identical rows."""
    letters = q.get("letters", ["A", "B", "C", "D"])
    rec = {
        "video_name": line["video_name"],
        "question": q["question"],
        "answer": q.get("answer", ""),
        "task_type": q.get("task_type", "all"),
        "raw": pred,
    }
    if q.get("free_form", False):
        rec["pred"] = pred.strip().rstrip(".").lower()
        rec["answer"] = str(q.get("answer", "")).lower()
    else:
        rec["pred"] = extract_letter(pred, letters)
    if "question_uid" in q:
        rec["question_uid"] = q["question_uid"]
        rec["pred_idx"] = letters.index(rec["pred"])
    return rec


def run_benchmark(
    name: str,
    predictor: TDCPredictor,
    samples: List[dict],
    out_dir: str = "./results",
    use_lvcot: bool = False,
    limit: Optional[int] = None,
    resume: bool = True,
    batch_slots: int = 0,
) -> dict:
    # Every benchmark takes the grouped path: one video decode + encode per
    # clip, and (with --batch_slots) all of a clip's questions decode through
    # one continuous-batching engine call with shared-prefix admission.
    # Sharding is per-video so the encode reuse stays on one host; `limit`
    # counts videos.
    samples = group_by_video(samples)
    samples = shard_samples(samples)
    if limit:
        samples = samples[:limit]

    # Crash resume (absent from the reference): every record is appended to a
    # per-host JSONL as it is produced; on restart, answered (video, question)
    # pairs are skipped.
    import jax as _jax
    import json as _json

    os.makedirs(os.path.join(out_dir, name.upper()), exist_ok=True)
    wal_path = os.path.join(
        out_dir, name.upper(), f"wal-host{_jax.process_index()}.jsonl"
    )
    records = []
    done = set()
    if resume and os.path.exists(wal_path):
        with open(wal_path) as fh:
            for line in fh:
                try:
                    r = _json.loads(line)
                except ValueError:
                    continue  # torn write from a crash
                records.append(r)
                done.add((r.get("video_name"), r.get("question")))
        if records:
            print(f"[{name}] resuming past {len(records)} answered samples", flush=True)
    wal = open(wal_path, "a")

    def emit(rec):
        records.append(rec)
        wal.write(_json.dumps(rec) + "\n")
        wal.flush()

    t_start = time.time()
    for i, line in enumerate(samples):
        pend = [
            q for q in line["questions"]
            if (line["video_name"], q["question"]) not in done
        ]
        if not pend:
            continue  # whole video already answered (crash resume)

        frames = None
        frame_seconds = None
        if line.get("data_type") == "frame":
            if not os.path.isdir(line["video"]):
                continue
            frames = load_frame_dir(line["video"], line.get("bound"))
            frame_seconds = np.arange(len(frames), dtype=np.float64)
        else:
            if not os.path.exists(line["video"]):
                continue
            from ..media.io import decode_video

            try:
                frames, frame_seconds = decode_video(
                    line["video"], fps=predictor.cfg.video_fps,
                    max_frames=predictor.max_eval_frames,
                )
            except IOError:
                continue
            bound = line.get("bound")
            if bound and bound[0] is not None:
                # MVBench bounded tasks: only the [start, end] span
                keep = (frame_seconds >= bound[0]) & (frame_seconds <= bound[1])
                if keep.any():
                    frames, frame_seconds = frames[keep], frame_seconds[keep]
        if frames is None or len(frames) == 0:
            continue

        # shared per-video prompt prefix: subtitles (eval_videomme.py:204-240)
        # + LVCoT (eval_mlvu.py:189-194), computed once per video
        prefix = ""
        sub_path = line.get("subtitle")
        if sub_path and os.path.exists(sub_path):
            subs = parse_srt(sub_path)
            prefix = subtitles_for_frames(subs, frame_seconds)
        if use_lvcot and len(frames) >= 600:
            think = lvcot(predictor, frames, max_forward=2, video_uid=line["video_name"])
            prefix = f"<think>{think}</think>" + prefix
        prefix += line.get("prompt", "")  # group-level prompt (rare)

        wav = None
        if line.get("audio") and os.path.exists(line["audio"]):
            from ..media.io import load_audio

            wav = load_audio(line["audio"])

        kw = dict(wav=wav, frame_seconds=frame_seconds, video_uid=line["video_name"])
        preds = None
        if batch_slots > 1 and len(pend) > 1:
            # all of a video's questions decode in one continuous-batching
            # lockstep loop with shared-prefix admission (runner.answer_many;
            # serving upgrade over the reference's per-question generate)
            try:
                preds = predictor.answer_many(
                    frames, [(prefix + q["prompt"], q["question"]) for q in pend],
                    num_slots=batch_slots, **kw,
                )
            except Exception as e:  # fault isolation: a mid-group engine
                # failure must not strand the video's questions or poison the
                # engine for the next video (the cached engine resets on its
                # next answer_many); fall back to the one-at-a-time path
                import warnings

                warnings.warn(
                    f"[{name}] answer_many failed for {line['video_name']!r} "
                    f"({e!r}); falling back to per-question decoding",
                    RuntimeWarning,
                )
        if preds is None:
            # one-at-a-time: emit each record AS it is produced, so a crash
            # mid-group loses at most the in-flight answer (WAL resume
            # granularity is per-question, not per-video)
            for q in pend:
                pred = predictor.answer(
                    frames, prefix + q["prompt"], qformer_prompt=q["question"], **kw
                )
                emit(_build_record(line, q, pred))
        else:
            for q, pred in zip(pend, preds):
                emit(_build_record(line, q, pred))
        if i % 10 == 0:
            el = time.time() - t_start
            print(f"[{name}] {i + 1}/{len(samples)} ({el:.0f}s)", flush=True)

    wal.close()
    records = allgather_records(records)
    metrics = accuracy_by_task(records)
    dump_results(records, metrics, os.path.join(out_dir, name.upper()), name)
    # WAL GC: every record is now in outputs-*.json, so the crash-resume
    # log has served its purpose; a stale WAL would seed a future run of
    # the same out_dir with old answers.
    try:
        os.remove(wal_path)
    except OSError:
        pass

    if name == "egoschema":  # Kaggle CSV (eval/README.md:27)
        import jax

        if jax.process_index() == 0:
            path = os.path.join(out_dir, "EGOSCHEMA", "submission.csv")
            with open(path, "w", newline="") as fh:
                w = csv.writer(fh)
                w.writerow(["q_uid", "answer"])
                for r in records:
                    w.writerow([r["question_uid"], r["pred_idx"]])
            print(f"[egoschema] kaggle csv -> {path}", flush=True)
    return metrics


def build_predictor(args, samples: Optional[List[dict]] = None) -> TDCPredictor:
    import jax.numpy as jnp

    from ..builder import load_pretrained_model

    quantize = getattr(args, "quantize", None)
    calib_pixels = None
    n_calib = getattr(args, "calib_frames", 0)
    if quantize == "int8-all" and n_calib > 0 and samples:
        # static W8A8 activation-scale calibration on the benchmark's own
        # first video (builder.load_pretrained_model calib_pixels): removes
        # the dynamic per-token amax pass from every tower layer (PERF.md r3)
        from ..builder import read_config
        from ..data.images import process_frames
        from ..media.io import decode_video

        calib_cfg = read_config(args.model_path)
        for line in samples:
            if line.get("data_type") == "frame" or not os.path.exists(line.get("video", "")):
                continue
            try:
                frames, _ = decode_video(line["video"], fps=1.0, max_frames=n_calib)
            except IOError:
                continue
            if len(frames) == 0:
                continue
            sig, dino = process_frames(list(frames[:n_calib]), calib_cfg)
            calib_pixels = (sig, dino)
            print(f"[calib] activation scales from {line['video']} "
                  f"({len(frames[:n_calib])} frames)", flush=True)
            break

    tokenizer, model, _, _ = load_pretrained_model(
        args.model_path, args.model_base, args.model_name, dtype=jnp.bfloat16,
        quantize=quantize, calib_pixels=calib_pixels,
    )
    bert_tok = None
    if args.bert_tokenizer:
        from transformers import BertTokenizer

        bert_tok = BertTokenizer.from_pretrained(args.bert_tokenizer, truncation_side="right")
    return TDCPredictor(
        model.cfg,
        model.params,
        tokenizer,
        bert_tokenizer=bert_tok,
        max_new_tokens=args.max_new_tokens,
        max_eval_frames=args.max_frames,
        device_preprocess=args.device_preprocess,
        act_quant=(quantize == "int8-all"),
        spec_window=getattr(args, "spec_window", 0),
    )


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()  # a fresh MLVU run recompiles one program per
    # (frame-bucket x gen-key); the persistent cache turns hours into seconds
    ap = argparse.ArgumentParser(description="TDC-Video TPU eval harness")
    ap.add_argument("benchmark", choices=sorted(LOADERS))
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--model_base", default=None)
    ap.add_argument("--model_name", default=None)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--bert_tokenizer", default="./checkpoints/bert-base-uncased")
    ap.add_argument("--out_dir", default="./results")
    ap.add_argument("--use_lvcot", action="store_true")
    ap.add_argument("--max_new_tokens", type=int, default=5)
    ap.add_argument("--max_frames", type=int, default=1000)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument(
        "--device_preprocess",
        action="store_true",
        help="pad/resize/normalize frames on-device (faster hosts-side; PIL parity path is the default)",
    )
    ap.add_argument(
        "--profile",
        default=None,
        metavar="LOGDIR",
        help="capture a jax.profiler device trace of the run into LOGDIR and "
        "print decode/model wall-time split",
    )
    ap.add_argument(
        "--quantize", default=None, choices=["int8", "int8-all"],
        help="int8: weight-only int8 LM for faster decode; int8-all: + "
        "int8-compute towers (~2x bf16 encode throughput — eval is "
        "tower-dominated; drift bounds in tests/test_quant.py)",
    )
    ap.add_argument(
        "--calib_frames", type=int, default=8,
        help="with --quantize int8-all: calibrate static per-layer tower "
        "activation scales on this many frames of the benchmark's first "
        "video (removes the dynamic per-token amax pass); 0 = dynamic scales",
    )
    ap.add_argument(
        "--batch_slots", type=int, default=0,
        help="decode a grouped video's questions together through the "
        "continuous-batching engine with this many cache slots "
        "(answer_many); 0/1 = one-at-a-time reference behavior",
    )
    ap.add_argument(
        "--spec_window", type=int, default=0,
        help="prompt-lookup speculative decoding window (eval decode is "
        "greedy, so answers are token-identical; pays off for long answers "
        "— LVCoT / open-ended benchmarks)",
    )
    args = ap.parse_args(argv)

    samples = LOADERS[args.benchmark](args.data_path)
    predictor = build_predictor(args, samples)
    import contextlib

    from ..utils.profiling import trace

    ctx = trace(args.profile) if args.profile else contextlib.nullcontext()
    with ctx:
        run_benchmark(
            args.benchmark,
            predictor,
            samples,
            out_dir=args.out_dir,
            use_lvcot=args.use_lvcot,
            limit=args.limit,
            batch_slots=args.batch_slots,
        )
    if args.profile:
        s = predictor.stats
        print(
            f"[profile] {s.samples} samples: host-assembly {s.decode_s:.2f}s "
            f"model {s.model_s:.2f}s compiles {len(s.compile_keys)} "
            f"trace -> {args.profile}",
            flush=True,
        )


if __name__ == "__main__":
    main()
