"""Decode tokens/sec benchmark: bf16 vs weight-only int8 LM (PERF.md).

Runs the jitted decode loop (serving.generate.decode_loop) for 64 tokens on
structural weights passed as jit args (honest; see PERF.md gotchas).
"""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tdc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import numpy as np, jax.numpy as jnp

def run(name, lm_cfg, quant, kv_quant=None):
    from tdc_video_tpu import config as C
    from tdc_video_tpu.models import lm as lm_mod
    from tdc_video_tpu.serving.generate import decode_loop
    from tdc_video_tpu.models.quant import quantize_lm_int8

    cfg = dataclasses.replace(C.tdc_tiny(), lm=lm_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: lm_mod.init_lm(jax.random.PRNGKey(0), lm_cfg, dtype=jnp.bfloat16))
    if quant:
        # structural zeros of the QUANTIZED tree directly: materializing the
        # bf16 tree first and quantizing on-device doubles HBM transiently
        # (full-size f32 intermediates) and OOMs at 7B on one chip
        shapes = jax.eval_shape(quantize_lm_int8, shapes)
    lm_params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = {"lm": lm_params}

    B = 1
    L = int(os.environ.get("TDC_DECODE_L", "512"))
    NEW = 64
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 1000, (B, L)), jnp.int32)

    def gen(params, ids, salt):
        embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], ids, cfg.dtype)
        embeds = embeds + salt
        cache = lm_mod.init_kv_cache(cfg.lm, B, L + NEW, cfg.dtype, quant=kv_quant)
        logits, cache = lm_mod.prefill(cfg.lm, params["lm"], embeds, jnp.ones((B, L), bool), cache, attn_impl="flash", dtype=cfg.dtype)
        first = jnp.argmax(logits, -1).astype(jnp.int32)
        return decode_loop(cfg, params, cache, first, NEW)

    j = jax.jit(gen)
    out = j(params, ids, jnp.asarray(0.0, cfg.dtype)); np.asarray(out)
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        out = j(params, ids, jnp.asarray(1e-3 * (i + 1), cfg.dtype)); np.asarray(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    # decode-only: time the same graph with NEW=1 and subtract (prefill + loop
    # overhead cancel), leaving 63 marginal decode steps
    def gen1(params, ids, salt):
        embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], ids, cfg.dtype)
        embeds = embeds + salt
        cache = lm_mod.init_kv_cache(cfg.lm, B, L + NEW, cfg.dtype, quant=kv_quant)
        logits, cache = lm_mod.prefill(cfg.lm, params["lm"], embeds, jnp.ones((B, L), bool), cache, attn_impl="flash", dtype=cfg.dtype)
        first = jnp.argmax(logits, -1).astype(jnp.int32)
        return decode_loop(cfg, params, cache, first, 1)
    j1 = jax.jit(gen1)
    out = j1(params, ids, jnp.asarray(0.0, cfg.dtype)); np.asarray(out)
    t1s = []
    for i in range(4):
        t0 = time.perf_counter()
        out = j1(params, ids, jnp.asarray(2e-3 * (i + 1), cfg.dtype)); np.asarray(out)
        t1s.append(time.perf_counter() - t0)
    dt1 = min(t1s)
    per_tok = (dt - dt1) / (NEW - 1)
    mode = ("int8" if quant else "bf16") + (f"+kv{kv_quant}" if kv_quant else "")
    print(f"{name} {mode}: decode {1/per_tok:.1f} tok/s "
          f"({per_tok*1e3:.2f} ms/tok); prefill+{NEW} in {dt*1e3:.0f}ms")

if __name__ == "__main__":
    from tdc_video_tpu import config as C
    which = sys.argv[1] if len(sys.argv) > 1 else "3b"
    lm = C.LLAMA32_3B if which == "3b" else C.QWEN2_7B
    modes = sys.argv[2:] or ["bf16", "int8", "int8+kv8"]
    for m in modes:
        run(which, lm, quant=m.startswith("int8"),
            kv_quant="int8" if "kv8" in m else None)
