"""Attribute Llama-3.2-3B prefill time per op (VERDICT r4 #4).

3B flash prefill reads 54.9% MFU @4k vs Qwen2-7B's 68.5%; this xplane trace
says whether the gap lives in the flash kernel (hd=128, 24q/8kv geometry —
tunable block sizes) or in the gemms (a shape property -> rejection entry).

Usage: python scripts/prefill3b_profile.py [T] [bq] [bk]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tdc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import numpy as np
import jax.numpy as jnp

from op_profile import parse_xplane, profile_fn
from prefill_bench import PEAK, prefill_flops, structural

from tdc_video_tpu import config as C
from tdc_video_tpu.models import lm as lm_mod
from tdc_video_tpu.ops import flash_attention as fa


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    if len(sys.argv) > 3:
        fa.DEFAULT_BLOCK_Q = int(sys.argv[2])
        fa.DEFAULT_BLOCK_K = int(sys.argv[3])
        print(f"blocks: q={fa.DEFAULT_BLOCK_Q} k={fa.DEFAULT_BLOCK_K}")
    cfg = C.LLAMA32_3B
    params = structural(cfg)

    def run(p, ids):
        embeds = lm_mod.embed_tokens(cfg, p, ids)
        cache = lm_mod.init_kv_cache(cfg, 1, T)
        logits, _ = lm_mod.prefill(
            cfg, p, embeds, jnp.ones((1, T), jnp.bool_), cache, attn_impl="flash"
        )
        return logits

    jrun = jax.jit(run)
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.integers(5, 100000, (1, T)), jnp.int32)
    o = jrun(params, mk())
    jax.block_until_ready(o)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        o = jrun(params, mk())
        jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"3B T={T} flash: {dt*1e3:.1f} ms, {T/dt:,.0f} tok/s, "
          f"MFU {prefill_flops(cfg, T)/dt/PEAK*100:.1f}%")

    logdir = f"/tmp/prof3b_{T}"
    profile_fn(lambda: jax.block_until_ready(jrun(params, mk())), (), logdir)
    per_op = parse_xplane(logdir, group=True)
    total = sum(per_op.values())
    print(f"\ntop ops ({total:.1f} ms total on-device):")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {ms:9.2f} ms  {ms/total*100:5.1f}%  {name}")


if __name__ == "__main__":
    main()
