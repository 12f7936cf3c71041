"""Tower-only microbench: time vit_forward per tower on the real chip.

Isolates the int8 ViT towers (97% of encode+compress, PERF.md) from the
SVA/TDC tail so kernel experiments iterate in seconds on a warm compile
cache.  Honest timing per CLAUDE.md: weights passed as jit args, salt gives
each iteration a distinct input, value fetches force completion.

Usage (from /root/repo):
    python scripts/tower_bench.py [--tower dino|siglip|both] [--frames 128]
                                  [--iters 5] [--attn flash|xla]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tower", default="both", choices=["dino", "siglip", "both"])
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--attn", default="flash", choices=["flash", "xla"])
    args = ap.parse_args()

    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from bench import build
    from tdc_video_tpu import config as C
    from tdc_video_tpu.models.vit import vit_forward

    cfg = C.tdc_qwen2_7b()
    cfg = dataclasses.replace(cfg, param_dtype=jnp.bfloat16)
    T = args.frames
    rng = np.random.default_rng(0)
    params = build(cfg)

    towers = ["dino", "siglip"] if args.tower == "both" else [args.tower]
    for name in towers:
        tcfg = getattr(cfg, name)
        px = jnp.asarray(
            rng.normal(0, 1, (T, tcfg.image_size, tcfg.image_size, 3)), cfg.dtype
        )

        @jax.jit
        def fwd(p, px, salt, tcfg=tcfg):
            return vit_forward(
                tcfg, p, px + salt, interpolate=False, attn_impl=args.attn,
                dtype=cfg.dtype,
            )

        out = fwd(params[name], px, jnp.asarray(0.0, cfg.dtype))
        np.asarray(out[0, 0, :4])  # warm + force

        t0 = time.perf_counter()
        outs = []
        for i in range(args.iters):
            outs.append(fwd(params[name], px, jnp.asarray(0.001 * (i + 1), cfg.dtype)))
        for o in outs:
            np.asarray(o[0, 0, :4])
        dt = time.perf_counter() - t0
        per_iter = dt / args.iters * 1000
        print(f"{name:7s} T={T} attn={args.attn}: {per_iter:8.1f} ms/iter "
              f"({T / (dt / args.iters):7.1f} frames/s)")


if __name__ == "__main__":
    main()
