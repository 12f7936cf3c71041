"""Model weight operations CLI.

Covers the reference's model-ops surface (SURVEY.md section 2.2 "Weight ops"):

* merge-lora — utils/merge_lora_weights.py:7-14 (base + adapter -> merged dir)
* make-delta / apply-delta — tdc/make_delta.py / tdc/apply_delta.py
* consolidate — tdc/consolidate.py (shard merge + re-save)
* export — save a loaded/trained param tree in the reference layout

    python -m tdc_video_tpu.cli.model_ops merge-lora \
        --model_path ckpt-lora --model_base ckpt-base --save_path merged/
"""

from __future__ import annotations

import argparse
import os


def cmd_merge_lora(args):
    from ..builder import load_pretrained_model
    from ..convert.to_hf import save_checkpoint_dir

    name = args.model_name or os.path.basename(args.model_path)
    if "lora" not in name.lower():
        name = name + "_lora"
    _, model, _, _ = load_pretrained_model(
        args.model_path, args.model_base, name, load_tokenizer=False
    )
    save_checkpoint_dir(model.params, model.cfg, args.save_path)
    print(f"merged model written to {args.save_path}")


# Keys allowed to differ in shape between base and target/delta: a resized
# vocabulary changes only the embedding table and the output head.  The
# reference asserts exactly this set and slice-combines the overlap
# (/root/reference/tdc/apply_delta.py, make_delta.py).
_VOCAB_RESIZE_KEYS = ("embed_tokens", "lm_head")


def combine_state_dicts(primary, base, sign):
    """primary +/- base over shared keys, reference delta semantics.

    * key missing from base: new multimodal module -> carried through as-is
      (the reference allowlists mm_projector.*; our checkpoints add the whole
      TDC module family, so any base-missing key passes through).
    * shapes equal: elementwise ``primary + sign * base``.
    * shapes differ on an embed_tokens / lm_head key (vocab resize): combine
      the overlapping [:rows, :cols] slice, keep primary's extra rows intact
      (/root/reference/tdc/apply_delta.py "dimension mismatch" branch).
    * shapes differ anywhere else: ValueError — never silently copy.
    * most keys missing from base: ValueError — the reference asserts an
      explicit mm_projector allowlist (/root/reference/tdc/apply_delta.py);
      a wrong/mismatched base would otherwise silently "reconstruct" a
      checkpoint that is mostly raw delta weights.
    """
    missing = [k for k in primary if k not in base]
    if primary and len(missing) > len(primary) // 2:
        raise ValueError(
            f"{len(missing)}/{len(primary)} keys missing from base "
            f"(e.g. {missing[:3]}): base checkpoint does not match — "
            "combining would pass raw primary weights through"
        )
    out = {}
    for k, v in primary.items():
        if k not in base:
            out[k] = v
            continue
        b = base[k]
        if b.shape == v.shape:
            out[k] = v + sign * b
        elif any(t in k for t in _VOCAB_RESIZE_KEYS) and v.ndim == b.ndim == 2:
            r = min(v.shape[0], b.shape[0])
            c = min(v.shape[1], b.shape[1])
            v = v.copy()
            v[:r, :c] = v[:r, :c] + sign * b[:r, :c]
            out[k] = v
        else:
            raise ValueError(
                f"shape mismatch for {k!r}: {v.shape} vs base {b.shape} "
                "(only embed_tokens/lm_head vocab resizes are combinable)"
            )
    return out


def cmd_make_delta(args):
    """delta = target - base (slice-subtract on vocab-resized embed/head)."""
    from ..builder import load_state_dict
    from ..convert.to_hf import save_safetensors

    base = load_state_dict(args.base)
    target = load_state_dict(args.target)
    delta = combine_state_dicts(target, base, sign=-1)
    os.makedirs(args.delta, exist_ok=True)
    save_safetensors(delta, os.path.join(args.delta, "model.safetensors"))
    for f in ("config.json", "tokenizer.json", "tokenizer_config.json"):
        src = os.path.join(args.target, f)
        if os.path.exists(src):
            import shutil

            shutil.copy(src, os.path.join(args.delta, f))
    print(f"delta written to {args.delta}")


def cmd_apply_delta(args):
    from ..builder import load_state_dict
    from ..convert.to_hf import save_safetensors

    base = load_state_dict(args.base)
    delta = load_state_dict(args.delta)
    out = combine_state_dicts(delta, base, sign=+1)
    os.makedirs(args.target, exist_ok=True)
    save_safetensors(out, os.path.join(args.target, "model.safetensors"))
    print(f"reconstructed model written to {args.target}")


def cmd_consolidate(args):
    """Merge sharded weight files into one safetensors (tdc/consolidate.py)."""
    from ..builder import load_state_dict
    from ..convert.to_hf import save_safetensors

    sd = load_state_dict(args.src)
    os.makedirs(args.dst, exist_ok=True)
    save_safetensors(sd, os.path.join(args.dst, "model.safetensors"))
    print(f"consolidated {len(sd)} tensors -> {args.dst}")


def cmd_export_orbax(args):
    """Convert an Orbax training checkpoint into a reference-format dir."""
    import jax
    import orbax.checkpoint as ocp

    from ..builder import read_config
    from ..convert.to_hf import save_checkpoint_dir
    from ..model import init_tdc

    cfg = read_config(args.config_dir)
    template = jax.eval_shape(lambda: init_tdc(jax.random.PRNGKey(0), cfg))
    import numpy as np

    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template
    )
    mgr = ocp.CheckpointManager(os.path.abspath(args.orbax_dir))
    step = args.step or mgr.latest_step()
    state = mgr.restore(step, args=ocp.args.StandardRestore({"params": template, "step": 0}))
    save_checkpoint_dir(state["params"], cfg, args.save_path)
    print(f"step {step} exported to {args.save_path}")


def main(argv=None):
    ap = argparse.ArgumentParser(description="TDC-Video TPU model ops")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("merge-lora")
    p.add_argument("--model_path", required=True)
    p.add_argument("--model_base", required=True)
    p.add_argument("--model_name", default=None)
    p.add_argument("--save_path", required=True)
    p.set_defaults(fn=cmd_merge_lora)

    p = sub.add_parser("make-delta")
    p.add_argument("--base", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--delta", required=True)
    p.set_defaults(fn=cmd_make_delta)

    p = sub.add_parser("apply-delta")
    p.add_argument("--base", required=True)
    p.add_argument("--delta", required=True)
    p.add_argument("--target", required=True)
    p.set_defaults(fn=cmd_apply_delta)

    p = sub.add_parser("consolidate")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.set_defaults(fn=cmd_consolidate)

    p = sub.add_parser("export-orbax")
    p.add_argument("--orbax_dir", required=True)
    p.add_argument("--config_dir", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--step", type=int, default=None)
    p.set_defaults(fn=cmd_export_orbax)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
