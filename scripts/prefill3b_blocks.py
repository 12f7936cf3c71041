"""Flash block-geometry sweep for Llama-3.2-3B prefill (VERDICT r4 #4).

The 3B head layout (hd=128, 24q/8kv -> groups=3) re-reads each K/V stream
from HBM once per kv-head; block_q/block_k set the VMEM working set and the
K-stream revisit count.  Sweeps (block_q, block_k) at 4k/8k and prints
ms + MFU per combo; the shipped default is 512/512.

Usage: python scripts/prefill3b_blocks.py [T ...]
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

from prefill_bench import PEAK, prefill_flops, structural

from tdc_video_tpu import config as C
from tdc_video_tpu.models import lm as lm_mod
from tdc_video_tpu.ops import flash_attention as fa


def main():
    ctxs = [int(a) for a in sys.argv[1:]] or [4096, 8192]
    cfg = C.LLAMA32_3B
    params = structural(cfg)
    rng = np.random.default_rng(0)

    for T in ctxs:
        for bq, bk in ((512, 512), (256, 512), (512, 1024), (1024, 512),
                       (1024, 1024), (256, 1024)):
            fa.DEFAULT_BLOCK_Q, fa.DEFAULT_BLOCK_K = bq, bk

            def run(p, ids):
                embeds = lm_mod.embed_tokens(cfg, p, ids)
                cache = lm_mod.init_kv_cache(cfg, 1, T)
                logits, _ = lm_mod.prefill(
                    cfg, p, embeds, jnp.ones((1, T), jnp.bool_), cache,
                    attn_impl="flash",
                )
                return logits

            jrun = jax.jit(run)
            mk = lambda: jnp.asarray(rng.integers(5, 100000, (1, T)), jnp.int32)
            try:
                o = jrun(params, mk())
                np.asarray(o[0, :4])
            except Exception as e:
                print(f"T={T} bq={bq} bk={bk}: FAILED {str(e).splitlines()[0][:90]}")
                continue
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                o = jrun(params, mk())
                np.asarray(o[0, :4])
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            print(f"T={T} bq={bq:4d} bk={bk:4d}: {dt*1e3:7.1f} ms  "
                  f"{T/dt:8,.0f} tok/s  MFU {prefill_flops(cfg, T)/dt/PEAK*100:.1f}%",
                  flush=True)


if __name__ == "__main__":
    main()
