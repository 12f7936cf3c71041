"""Speculative-decode benchmark: prompt-lookup (PLD) vs plain greedy loop.

Same honest methodology as decode_bench.py (structural weights as jit args,
marginal-cost subtraction via a max_new=1 run).  Zero weights make greedy
argmax constantly token 0, which pins the two acceptance regimes exactly:

* ceiling — prompt ends in a run of 0s, so every lookup finds the gram and
  drafts 0s == greedy output: full acceptance, ~window tokens per verify;
* floor — drafts force-rejected via pld_decode_loop(_bench_reject_drafts):
  1 token per verify forward, the worst-case overhead of speculation.
  (A "no-repeats prompt" does NOT give a floor: the constant greedy stream
  of zero weights self-matches its own grams within a few tokens.)

Real-workload acceptance sits between the two and is content-dependent
(extractive/echoing answers near the ceiling).

Usage: python scripts/spec_bench.py [3b|7b] [window ...]
"""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tdc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import numpy as np, jax.numpy as jnp

L = int(os.environ.get("TDC_DECODE_L", "512"))
NEW = 64
B = 1


def build(lm_cfg):
    from tdc_video_tpu import config as C
    from tdc_video_tpu.models import lm as lm_mod
    from tdc_video_tpu.models.quant import quantize_lm_int8

    cfg = dataclasses.replace(
        C.tdc_tiny(), lm=lm_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
    )
    shapes = jax.eval_shape(lambda: lm_mod.init_lm(jax.random.PRNGKey(0), lm_cfg, dtype=jnp.bfloat16))
    shapes = jax.eval_shape(quantize_lm_int8, shapes)
    lm_params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    return cfg, {"lm": lm_params}


def prompts():
    # ceiling: trailing run of 0s seeds full-acceptance lookup
    ceil = np.full((B, L), 7, np.int64)
    ceil[:, L // 2 :] = 0
    # floor: prompt content is irrelevant (drafts force-rejected)
    floor = np.arange(5, 5 + L, dtype=np.int64)[None].repeat(B, 0)
    return {"ceiling": (ceil, False), "floor": (floor, True)}


def run(name, lm_cfg, windows):
    from tdc_video_tpu.models import lm as lm_mod
    from tdc_video_tpu.serving.generate import decode_loop
    from tdc_video_tpu.serving.speculative import pld_decode_loop

    cfg, params = build(lm_cfg)

    def gen(params, ids, salt, new, window, reject):
        embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], ids, cfg.dtype)
        embeds = embeds + salt
        cap = L + new + max(window - 1, 0)
        cache = lm_mod.init_kv_cache(cfg.lm, B, cap, cfg.dtype)
        logits, cache = lm_mod.prefill(
            cfg.lm, params["lm"], embeds, jnp.ones((B, L), bool), cache,
            attn_impl="flash", dtype=cfg.dtype,
        )
        first = jnp.argmax(logits, -1).astype(jnp.int32)
        if window == 0:
            return decode_loop(cfg, params, cache, first, new)
        plen = jnp.full((B,), L, jnp.int32)
        return pld_decode_loop(
            cfg, params, cache, first, ids, plen, new, window=window, ngram=3,
            _bench_reject_drafts=reject,
        )

    def time_mode(ids, window, reject=False):
        j = jax.jit(lambda p, i, s: gen(p, i, s, NEW, window, reject))
        j1 = jax.jit(lambda p, i, s: gen(p, i, s, 1, window, reject))
        ids = jnp.asarray(ids, jnp.int32)
        np.asarray(j(params, ids, jnp.asarray(0.0, cfg.dtype)))
        np.asarray(j1(params, ids, jnp.asarray(0.0, cfg.dtype)))
        ts, t1s = [], []
        for i in range(4):
            s = jnp.asarray(1e-3 * (i + 1), cfg.dtype)
            t0 = time.perf_counter(); np.asarray(j(params, ids, s)); ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(j1(params, ids, s)); t1s.append(time.perf_counter() - t0)
        return (min(ts) - min(t1s)) / (NEW - 1)

    for pname, (ids, reject) in prompts().items():
        base = time_mode(ids, 0)
        print(f"{name} plain   [{pname:7s}]: {1/base:6.1f} tok/s ({base*1e3:.2f} ms/tok)")
        for w in windows:
            t = time_mode(ids, w, reject)
            print(f"{name} spec w={w} [{pname:7s}]: {1/t:6.1f} tok/s "
                  f"({t*1e3:.2f} ms/tok, {base/t:.2f}x plain)")


if __name__ == "__main__":
    from tdc_video_tpu import config as C

    which = sys.argv[1] if len(sys.argv) > 1 else "7b"
    windows = [int(w) for w in sys.argv[2:]] or [4, 8]
    run(which, C.LLAMA32_3B if which == "3b" else C.QWEN2_7B, windows)
