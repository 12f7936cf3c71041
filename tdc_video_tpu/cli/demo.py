"""Single-shot video(+audio) QA demo.

Replaces the reference demo (main.py:17-73): decode at 1 fps, optional wav,
qwen/llama template, greedy generate.

    python -m tdc_video_tpu.cli.demo --model_path checkpoints/TDC-Qwen2-7B \
        --video examples/video1.mp4 --audio examples/audio1.wav \
        --question "Describe this video in detail."
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()  # second invocation compiles ~nothing
    ap = argparse.ArgumentParser(description="TDC-Video TPU demo")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--model_base", default=None)
    ap.add_argument("--model_name", default=None)
    ap.add_argument("--video", required=True)
    ap.add_argument("--audio", default=None)
    ap.add_argument("--question", default="Describe this video in detail.")
    ap.add_argument("--bert_tokenizer", default="./checkpoints/bert-base-uncased")
    ap.add_argument("--max_new_tokens", type=int, default=128)
    ap.add_argument("--max_frames", type=int, default=1000)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--kv_quant", default=None, choices=["int8"],
                    help="int8 KV cache (halves cache footprint/traffic)")
    ap.add_argument(
        "--spec_window", type=int, default=0,
        help="prompt-lookup speculative decoding window (greedy only; >=2 "
        "enables — exact same tokens, up to window x faster when the answer "
        "echoes the prompt; see serving/speculative.py)",
    )
    ap.add_argument(
        "--quantize", default=None, choices=["int8", "int8-all"],
        help="weight-only int8 LM (TPU-native replacement for the reference's "
        "bnb 4/8-bit loading; ~2x decode throughput)",
    )
    ap.add_argument(
        "--profile",
        default=None,
        metavar="LOGDIR",
        help="capture a jax.profiler device trace of the inference into LOGDIR "
        "(view in TensorBoard/Perfetto) and print per-stage wall times",
    )
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..builder import load_pretrained_model
    from ..eval.runner import TDCPredictor
    from ..media.io import decode_video, load_audio

    t0 = time.time()
    tokenizer, model, _, _ = load_pretrained_model(
        args.model_path, args.model_base, args.model_name, dtype=jnp.bfloat16,
        quantize=args.quantize,
    )
    bert_tok = None
    if args.bert_tokenizer:
        try:
            from transformers import BertTokenizer

            bert_tok = BertTokenizer.from_pretrained(
                args.bert_tokenizer, truncation_side="right"
            )
        except Exception:
            pass
    print(f"model loaded in {time.time() - t0:.1f}s")

    frames, ts = decode_video(
        args.video, fps=model.cfg.video_fps, max_frames=args.max_frames
    )
    print(f"video: {len(frames)} frames @ 1 fps")
    wav = None
    if args.audio:
        wav = load_audio(args.audio)
    elif model.cfg.audio_input:
        wav = load_audio(args.video)  # soundtrack of the video itself

    predictor = TDCPredictor(
        model.cfg,
        model.params,
        tokenizer,
        bert_tokenizer=bert_tok,
        max_new_tokens=args.max_new_tokens,
        max_eval_frames=args.max_frames,
        act_quant=(args.quantize == "int8-all"),
        kv_quant=args.kv_quant,
        spec_window=args.spec_window,
    )
    t1 = time.time()
    import contextlib

    from ..utils.profiling import trace

    ctx = trace(args.profile) if args.profile else contextlib.nullcontext()
    with ctx:
        answer = predictor.answer(
            frames, args.question, wav=wav, frame_seconds=ts,
            max_new_tokens=args.max_new_tokens,
            video_uid=args.video,
        )
    print(f"\n{answer}\n\n[{time.time() - t1:.1f}s inference]")
    if args.profile:
        s = predictor.stats
        print(
            f"[profile] host-assembly {s.decode_s:.2f}s model {s.model_s:.2f}s "
            f"trace -> {args.profile}"
        )


if __name__ == "__main__":
    main()
