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

from .datasets import LOADERS, parse_srt, subtitles_for_frames
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
        if "questions" in line:
            if all((line["video_name"], q["question"]) in done for q in line["questions"]):
                continue  # whole grouped video already answered
        elif (line.get("video_name"), line.get("question")) in done:
            continue
        free_form = line.get("free_form", False)
        letters = line.get("letters", ["A", "B", "C", "D"])

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

        prompt = line["prompt"]
        # Video-MME subtitle conditioning (eval_videomme.py:204-240)
        sub_path = line.get("subtitle")
        if sub_path and os.path.exists(sub_path):
            subs = parse_srt(sub_path)
            prompt = subtitles_for_frames(subs, frame_seconds) + prompt

        # LVCoT for long videos (eval_mlvu.py:189-194)
        if use_lvcot and len(frames) >= 600:
            think = lvcot(predictor, frames, max_forward=2, video_uid=line["video_name"])
            prompt = f"<think>{think}</think>" + prompt

        wav = None
        if line.get("audio") and os.path.exists(line["audio"]):
            from ..media.io import load_audio

            wav = load_audio(line["audio"])

        if "questions" in line:  # grouped (videomme): many questions, one video
            pend = [q for q in line["questions"]
                    if (line["video_name"], q["question"]) not in done]

            def _qprompt(q):
                opt = "".join(f"{o}\n" for o in q["choices"])
                qp = (
                    f"Question: {q['question']}\nOptions:\n{opt}"
                    "Respond with only the letter (A, B, C, or D) of the correct option.\n"
                ).rstrip()
                return (prompt + qp) if sub_path else qp

            if batch_slots > 1 and len(pend) > 1:
                # all of a video's questions decode in one continuous-batching
                # lockstep loop (runner.answer_many; serving upgrade over the
                # reference's per-question generate)
                preds = predictor.answer_many(
                    frames, [(_qprompt(q), q["question"]) for q in pend],
                    wav=wav, frame_seconds=frame_seconds,
                    video_uid=line["video_name"], num_slots=batch_slots,
                )
            else:
                preds = [
                    predictor.answer(
                        frames, _qprompt(q), qformer_prompt=q["question"],
                        wav=wav, frame_seconds=frame_seconds,
                        video_uid=line["video_name"],
                    )
                    for q in pend
                ]
            for q, pred in zip(pend, preds):
                emit(
                    {
                        "video_name": line["video_name"],
                        "question": q["question"],
                        "answer": q.get("answer", ""),
                        "pred": extract_letter(pred),
                        "task_type": line.get("duration", "videomme"),
                        "raw": pred,
                    }
                )
        else:
            pred = predictor.answer(
                frames, prompt, qformer_prompt=line["question"],
                wav=wav, frame_seconds=frame_seconds,
                video_uid=line["video_name"],
            )
            rec = {
                "video_name": line["video_name"],
                "question": line["question"],
                "answer": line["answer"],
                "task_type": line["task_type"],
                "raw": pred,
            }
            if free_form:
                rec["pred"] = pred.strip().rstrip(".").lower()
                rec["answer"] = str(line["answer"]).lower()
            else:
                rec["pred"] = extract_letter(pred, letters)
            if "question_uid" in line:
                rec["question_uid"] = line["question_uid"]
                rec["pred_idx"] = letters.index(rec["pred"])
            emit(rec)
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


def build_predictor(args) -> TDCPredictor:
    import jax.numpy as jnp

    from ..builder import load_pretrained_model

    tokenizer, model, _, _ = load_pretrained_model(
        args.model_path, args.model_base, args.model_name, dtype=jnp.bfloat16,
        quantize=getattr(args, "quantize", None),
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
        "--quantize", default=None, choices=["int8"],
        help="weight-only int8 LM for faster decode",
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

    predictor = build_predictor(args)
    samples = LOADERS[args.benchmark](args.data_path)
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
