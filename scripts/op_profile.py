"""Op-level time attribution for the bench pipeline (or any jitted fn).

Runs the bench.py tower+SVA+TDC pipeline once under jax.profiler, then parses
the .xplane.pb directly with jax.profiler.ProfileData: sums event durations
per op name over TPU device planes.  This is the methodology that found the
round-2/3 attention wins (CLAUDE.md).

Usage (from /root/repo — axon platform discovery requires it):
    python scripts/op_profile.py [--top 40] [--group]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile_fn(fn, args, logdir="/tmp/opprof"):
    import jax
    import numpy as np

    out = fn(*args)  # warm (compile)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    jax.profiler.start_trace(logdir)
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    jax.profiler.stop_trace()
    return logdir


def parse_xplane(logdir, group=False):
    from jax.profiler import ProfileData

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no xplane.pb under {logdir}"
    data = ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    per_op = defaultdict(float)
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name
                if group:
                    # strip trailing .N indices so fusion variants merge
                    name = re.sub(r"\.\d+$", "", name)
                per_op[name] += dur
    return per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--frames", type=int, default=128)
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
    from tdc_video_tpu.model import encode_frames, prepare_visual

    cfg = C.tdc_qwen2_7b()
    cfg = dataclasses.replace(cfg, param_dtype=jnp.bfloat16)
    T = args.frames
    params = build(cfg)
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.normal(0, 1, (T, cfg.siglip.image_size, cfg.siglip.image_size, 3)), cfg.dtype)
    dino = jnp.asarray(rng.normal(0, 1, (T, cfg.dino.image_size, cfg.dino.image_size, 3)), cfg.dtype)
    frame_mask = jnp.ones((T,), jnp.bool_)
    text_ids = jnp.asarray(rng.integers(1, 1000, (16,)), jnp.int32)
    text_mask = jnp.ones((16,), jnp.bool_)

    @jax.jit
    def pipeline(params, sig, dino, salt):
        sig = sig + salt
        dino = dino + salt
        feats, dfeats = encode_frames(cfg, params, sig, dino, attn_impl="flash")
        visual, n = prepare_visual(
            cfg, params, feats, dfeats, frame_mask, text_ids, text_mask, max_visual_len=4096
        )
        return visual, n

    logdir = profile_fn(pipeline, (params, sig, dino, jnp.asarray(0.01, cfg.dtype)))
    per_op = parse_xplane(logdir, group=args.group)
    total = sum(per_op.values())
    print(f"total device op time: {total:.1f} ms")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ms:9.2f} ms  {100*ms/total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
