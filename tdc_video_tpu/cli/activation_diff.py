"""Per-stage activation dump / diff harness.

The day real TDC checkpoints are available (no network egress in the build
environment — TODO.md "Numerics validation"), parity against the torch
reference is checked stage by stage:

1. on the reference side, dump activations for one video + prompt with the
   reference model (torch) into an .npz keyed by stage name;
2. here: `dump` runs the same inputs through this framework and writes the
   same keys;
3. `diff` compares any two dumps with per-stage max-abs/rel stats.

Stages: towers (siglip/dino features), sva (fused frame features),
segmentation boundaries, compressed visual tokens, prefill logits.

    python -m tdc_video_tpu.cli.activation_diff dump \
        --model_path ckpt --video v.mp4 --question "..." --out ours.npz
    python -m tdc_video_tpu.cli.activation_diff diff ours.npz theirs.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def dump(args):
    import jax.numpy as jnp

    from ..builder import load_pretrained_model
    from ..data.images import frame_bucket, pad_frames, process_frames
    from ..media.io import decode_video
    from ..model import encode_frames, prepare_visual
    from ..models import lm as lm_mod
    from ..models.vit import vit_forward
    from ..ops.segment import segment_boundaries

    try:
        tokenizer, model, _, _ = load_pretrained_model(args.model_path, dtype=jnp.bfloat16)
    except Exception:
        # no tokenizer files alongside the checkpoint: the text-logits stage
        # is skipped, the visual stages still dump
        tokenizer, model, _, _ = load_pretrained_model(
            args.model_path, dtype=jnp.bfloat16, load_tokenizer=False
        )
    cfg, params = model.cfg, model.params
    frames, ts = decode_video(args.video, fps=cfg.video_fps, max_frames=args.max_frames)
    sig, dino = process_frames(list(frames), cfg)
    T = frame_bucket(len(frames))
    sig, dino, fmask = pad_frames(sig, dino, T)
    sig = jnp.asarray(sig, cfg.dtype)
    dino = jnp.asarray(dino, cfg.dtype)

    out = {}
    out["siglip_feats"] = np.asarray(
        vit_forward(cfg.siglip, params["siglip"], sig, dtype=cfg.dtype), np.float32
    )
    out["dino_feats"] = np.asarray(
        vit_forward(cfg.dino, params["dino"], dino, dtype=cfg.dtype), np.float32
    )
    ff, df = encode_frames(cfg, params, sig, dino)
    out["frame_feats"] = np.asarray(ff, np.float32)
    out["boundaries"] = np.asarray(
        segment_boundaries(df, jnp.asarray(fmask), cfg.compression.max_num_segments)
    )
    qids = jnp.zeros((16,), jnp.int32)
    qmask = jnp.zeros((16,), jnp.bool_)
    visual, n_vis = prepare_visual(
        cfg, params, ff, df, jnp.asarray(fmask), qids, qmask, max_visual_len=4096
    )
    out["visual"] = np.asarray(visual, np.float32)[: int(n_vis)]

    if args.question and tokenizer is not None:
        from ..eval.runner import HFTokenizerAdapter, TDCPredictor

        pred = TDCPredictor(cfg, params, HFTokenizerAdapter(tokenizer))
        ids, img_pos, _ = pred.build_text(args.question)
        embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], jnp.asarray([ids]), cfg.dtype)
        logits = lm_mod.lm_forward(cfg.lm, params["lm"], inputs_embeds=embeds, dtype=cfg.dtype)
        out["text_logits"] = np.asarray(logits, np.float32)

    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


def diff(args):
    a = np.load(args.a)
    b = np.load(args.b)
    keys = sorted(set(a.files) & set(b.files))
    missing = sorted(set(a.files) ^ set(b.files))
    if missing:
        print(f"only in one dump: {missing}")
    worst = 0.0
    for k in keys:
        x, y = a[k].astype(np.float64), b[k].astype(np.float64)
        if x.shape != y.shape:
            print(f"{k}: SHAPE {x.shape} vs {y.shape}")
            worst = np.inf
            continue
        ad = np.abs(x - y).max() if x.size else 0.0
        denom = max(np.abs(y).max(), 1e-9)
        print(f"{k}: max-abs {ad:.3e}  max-rel {ad / denom:.3e}")
        worst = max(worst, ad / denom)
    print(f"worst rel: {worst:.3e}")
    return 0 if worst < args.tol else 1


def main(argv=None):
    ap = argparse.ArgumentParser(description="per-stage activation dump/diff")
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--model_path", required=True)
    d.add_argument("--video", required=True)
    d.add_argument("--question", default="")
    d.add_argument("--max_frames", type=int, default=1000)
    d.add_argument("--out", required=True)
    c = sub.add_parser("diff")
    c.add_argument("a")
    c.add_argument("b")
    c.add_argument("--tol", type=float, default=3e-2)
    args = ap.parse_args(argv)
    if args.cmd == "dump":
        dump(args)
        return 0
    return diff(args)


if __name__ == "__main__":
    raise SystemExit(main())
