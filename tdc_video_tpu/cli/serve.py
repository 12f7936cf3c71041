"""Multi-question video QA through the continuous-batching engine.

Answers N questions about one video with the towers run ONCE and all
decodes sharing one lockstep loop over KV-cache slots
(serving/batching.py::DecodeEngine) — a serving capability the reference
lacks entirely (its generate handles one request at a time and stashes
vision state on `self`, tdc/language_model/cambrian_qwen.py:441-457).

    python -m tdc_video_tpu.cli.serve --model_path checkpoints/TDC-Qwen2-7B \
        --video examples/video1.mp4 --slots 4 \
        --question "What happens first?" --question "Who appears?"

Questions can also come one-per-line from --questions_file.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()  # second invocation compiles ~nothing
    ap = argparse.ArgumentParser(description="TDC-Video TPU multi-question serving")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--model_base", default=None)
    ap.add_argument("--model_name", default=None)
    ap.add_argument("--video", required=True)
    ap.add_argument("--audio", default=None)
    ap.add_argument("--question", action="append", default=[],
                    help="repeatable; one request per question")
    ap.add_argument("--questions_file", default=None,
                    help="newline-separated questions")
    ap.add_argument("--bert_tokenizer", default="./checkpoints/bert-base-uncased")
    ap.add_argument("--max_new_tokens", type=int, default=128)
    ap.add_argument("--max_frames", type=int, default=1000)
    ap.add_argument("--slots", type=int, default=4,
                    help="concurrent KV-cache slots in the decode engine")
    ap.add_argument("--quantize", default=None, choices=["int8", "int8-all"])
    ap.add_argument("--kv_quant", default=None, choices=["int8"],
                    help="int8 KV cache (halves decode HBM traffic)")
    ap.add_argument(
        "--spec_window", type=int, default=0,
        help="prompt-lookup speculative lockstep decode (greedy; >=2 enables "
        "per-slot drafting — exact same tokens; see serving/speculative.py)",
    )
    ap.add_argument(
        "--temperature", type=float, default=0.0,
        help="per-request sampling (the reference demo's do_sample path, "
        "main.py:64-65; HF warper order temperature -> top-k -> top-p). "
        "0 = greedy. Sampled runs route to a plain-lockstep engine "
        "(speculation is exact-greedy only)",
    )
    ap.add_argument("--top_k", type=int, default=50)
    ap.add_argument("--top_p", type=float, default=1.0)
    ap.add_argument(
        "--seed", type=int, default=0,
        help="sampling seed; question i draws from stream seed+i — "
        "reproducible and independent of slot placement",
    )
    ap.add_argument(
        "--stream", action="store_true",
        help="print tokens as slots decode them (interleaved, prefixed by "
        "question index) instead of only the final answers",
    )
    ap.add_argument(
        "--mesh", default=None, metavar="DxM",
        help="multi-chip serving over a data-x-model device mesh (e.g. 4x2 "
        "on a v5e-8): frames shard over `data` for tower encode, the LM "
        "shards over `model` for tensor-parallel prefill/decode, and the "
        "engine KV cache shards with the heads — token-identical to "
        "single-chip serving (tests/test_parallel.py)",
    )
    ap.add_argument(
        "--chat", action="store_true",
        help="multi-turn mode: treat the questions as SEQUENTIAL turns of "
        "one conversation — each follow-up extends the previous turn's "
        "resident KV cache instead of re-encoding the video and "
        "re-prefilling the conversation (serving/session.ChatSession; "
        "capability upgrade over the reference's single-shot main.py:60)",
    )
    ap.add_argument(
        "--chat_capacity", type=int, default=None,
        help="with --chat: total conversation token budget (default: first "
        "prompt bucket + 2048)",
    )
    ap.add_argument(
        "--prefill_chunk", type=int, default=0,
        help="chunked admission: prefill long prompts N tokens per decode "
        "chunk so new questions never stall in-flight answers for a whole "
        "prefill (exact; 0 = one-shot prefill)",
    )
    args = ap.parse_args(argv)

    questions = list(args.question)
    if args.questions_file:
        with open(args.questions_file) as fh:
            questions += [q.strip() for q in fh if q.strip()]
    if not questions:
        ap.error("no questions (use --question or --questions_file)")

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
    print(f"video: {len(frames)} frames @ 1 fps; {len(questions)} questions, "
          f"{args.slots} slots")
    wav = None
    if args.audio:
        wav = load_audio(args.audio)
    elif model.cfg.audio_input:
        wav = load_audio(args.video)

    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh

        n_data, n_model = (int(x) for x in args.mesh.lower().split("x"))
        mesh = make_mesh(n_data, n_model)
        print(f"mesh: {n_data}x{n_model} over {n_data * n_model} devices")

    predictor = TDCPredictor(
        model.cfg,
        model.params,
        tokenizer,
        bert_tokenizer=bert_tok,
        max_new_tokens=args.max_new_tokens,
        max_eval_frames=args.max_frames,
        act_quant=(args.quantize == "int8-all"),
        spec_window=args.spec_window,
        mesh=mesh,
    )
    on_tokens = None
    if args.stream:
        import sys

        printed = {}  # uid -> chars already emitted
        state = {"last": None}

        def on_tokens(req, new):
            # decode the WHOLE accumulated stream and emit only the new
            # suffix: token-by-token decode would split multi-token
            # characters and drop sentencepiece word boundaries
            text = tokenizer.decode(req.tokens, skip_special_tokens=True)
            # hold back trailing U+FFFD: a partial multi-byte character
            # decodes to the replacement char until the next token lands —
            # emitting it now would print a char the stream later revises.
            # A split UTF-8 char yields at most 2 replacement chars, so hold
            # back only that many: genuine U+FFFD tokens deeper in a trailing
            # run still stream out
            stripped = text.rstrip("�")
            held = min(len(text) - len(stripped), 2)
            text = text[: len(text) - held] if held else text
            prev = printed.get(req.uid, "")
            if text.startswith(prev):
                delta = text[len(prev) :]
            else:
                # the decoded stream revised already-emitted characters
                # (rare tokenizer normalization); reprint the full answer
                delta = "\n[q%s|revised] %s" % (req.uid, text)
            printed[req.uid] = text
            if not delta:
                return
            if state["last"] != req.uid:
                sys.stdout.write(f"\n[q{req.uid}] ")
                state["last"] = req.uid
            sys.stdout.write(delta)
            sys.stdout.flush()

    if args.chat:
        t1 = time.time()
        sess = predictor.chat(
            frames, wav=wav, frame_seconds=ts, video_uid=args.video,
            max_new_tokens=args.max_new_tokens, capacity=args.chat_capacity,
            kv_quant=args.kv_quant, temperature=args.temperature,
            top_k=args.top_k, top_p=args.top_p, seed=args.seed,
            on_tokens=on_tokens,
        )
        for i, q in enumerate(questions):
            ta = time.time()
            a = sess.ask(q)
            if args.stream:
                print()
            print(f"\n[turn {i + 1} | {time.time() - ta:.1f}s] Q: {q}\nA: {a}")
        sess.close()
        print(f"\n[{len(questions)}-turn conversation in {time.time() - t1:.1f}s]")
        return

    t1 = time.time()
    answers = predictor.answer_many(
        frames,
        questions,
        wav=wav,
        frame_seconds=ts,
        max_new_tokens=args.max_new_tokens,
        video_uid=args.video,
        num_slots=args.slots,
        kv_quant=args.kv_quant,
        prefill_chunk=args.prefill_chunk,
        on_tokens=on_tokens,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        seed=args.seed,
    )
    dt = time.time() - t1
    if args.stream:
        print()
    for q, a in zip(questions, answers):
        print(f"\nQ: {q}\nA: {a}")
    print(f"\n[{len(questions)} answers in {dt:.1f}s]")


if __name__ == "__main__":
    main()
