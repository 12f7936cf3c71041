"""Benchmark: end-to-end video encode+compress throughput on one TPU chip.

Measures the north-star metric from BASELINE.json: video-seconds processed
per wall-second through the full TDC front half — SigLIP-so400m + DINOv2-giant
towers, SVA connector, DINO scene segmentation, and the batched Q-Former TDC
compression — at 1 fps (so frames/sec == video-sec/sec).  Baseline = 1.0x
playback (the reference's requirement for real-time long-video ingestion).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax

# persistent compile cache: tower compiles are ~7 min cold on a 1-core host,
# seconds warm; the cache dir survives across driver rounds
try:
    import os as _os

    jax.config.update("jax_compilation_cache_dir", _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass
import jax.numpy as jnp


def build(cfg):
    from tdc_video_tpu.model import init_tdc
    from tdc_video_tpu.models.quant import quantize_vit_int8

    # Structural (zeros) init: benchmark timing is weight-independent, and
    # materializing ~9B random values host-side would dominate startup.
    # Towers are int8-quantized with static calibrated activation scales —
    # the shipped serving configuration (`--quantize int8-all` after
    # calibrate_vit_act_scales; drift bounds in tests/test_quant.py): the
    # s8 x s8 MXU path roughly doubles compute-bound tower throughput, and
    # static scales remove the per-token amax HBM pass (PERF.md round 3).
    shapes = jax.eval_shape(lambda: init_tdc(jax.random.PRNGKey(0), cfg))
    shapes["siglip"] = jax.eval_shape(quantize_vit_int8, shapes["siglip"])
    shapes["dino"] = jax.eval_shape(quantize_vit_int8, shapes["dino"])
    keep = {"siglip", "dino", "sva", "compressor", "image_newline"}
    params = {
        k: jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v)
        for k, v in shapes.items()
        if k in keep
    }
    for tower in ("siglip", "dino"):
        L = cfg.siglip.num_layers if tower == "siglip" else cfg.dino.num_layers
        params[tower]["layers"]["act_scale"] = {
            site: jnp.ones((L,), jnp.float32)
            for site in ("qkv", "attn", "mlp", "down")
        }
    return params


def main():
    import dataclasses

    from tdc_video_tpu import config as C
    from tdc_video_tpu.model import encode_frames, prepare_visual

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    cfg = C.tdc_qwen2_7b()
    cfg = dataclasses.replace(cfg, param_dtype=jnp.bfloat16)
    T = 128 if on_tpu else 4  # frames per step (= video seconds at 1 fps)
    iters = 5 if on_tpu else 1
    if not on_tpu:
        cfg = C.tdc_tiny()

    params = build(cfg)
    rng = np.random.default_rng(0)
    sig = jnp.asarray(
        rng.normal(0, 1, (T, cfg.siglip.image_size, cfg.siglip.image_size, 3)), cfg.dtype
    )
    dino = jnp.asarray(
        rng.normal(0, 1, (T, cfg.dino.image_size, cfg.dino.image_size, 3)), cfg.dtype
    )
    frame_mask = jnp.ones((T,), jnp.bool_)
    text_ids = jnp.asarray(rng.integers(1, 1000, (16,)), jnp.int32)
    text_mask = jnp.ones((16,), jnp.bool_)

    @jax.jit
    def pipeline(params, sig, dino, salt):
        # `salt` varies per iteration: the axon runtime memoizes identical
        # (executable, args) executions, which would make repeated-input
        # timing loops free after the first run.
        sig = sig + salt
        dino = dino + salt
        feats, dfeats = encode_frames(cfg, params, sig, dino, attn_impl="flash")
        visual, n = prepare_visual(
            cfg, params, feats, dfeats, frame_mask, text_ids, text_mask, max_visual_len=4096
        )
        return visual, n

    visual, n = pipeline(params, sig, dino, jnp.asarray(0.0, cfg.dtype))  # compile+warmup
    np.asarray(n)  # value fetch: block_until_ready can return early on this runtime

    t0 = time.perf_counter()
    ns = []
    for i in range(iters):
        visual, n = pipeline(params, sig, dino, jnp.asarray(0.001 * (i + 1), cfg.dtype))
        ns.append(n)
    for x in ns:  # force every iteration's completion with a value fetch
        np.asarray(x)
    dt = time.perf_counter() - t0

    video_sec_per_sec = (T * iters) / dt
    print(
        json.dumps(
            {
                "metric": "encode_compress_throughput",
                "value": round(video_sec_per_sec, 3),
                "unit": "video-sec/sec (1 fps frames, so400m+dinov2g+SVA+TDC)",
                "vs_baseline": round(video_sec_per_sec / 1.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
