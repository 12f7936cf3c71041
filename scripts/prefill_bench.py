"""7B prefill tokens/sec/chip benchmark (BASELINE.json axis 2).

Times lm.prefill on the real chip at 4k/8k context, flash vs XLA attention,
with MFU vs the v5e bf16 peak (197 TFLOP/s). Weights are structural zeros in
bf16 (throughput depends on shapes, not values).
Reference hot path being replaced: /root/reference/tdc/cambrian_qwen.py:399-457.
"""
import sys, time, json
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from tdc_video_tpu import config as C
from tdc_video_tpu.models import lm as lm_mod

PEAK = 197e12  # v5e bf16

def structural(cfg):
    shapes = jax.eval_shape(lambda: lm_mod.init_lm(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

def prefill_flops(cfg, T):
    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    qd, kvd = cfg.num_heads * cfg.head_dim, cfg.num_kv_heads * cfg.head_dim
    proj = 2 * T * (H * qd + 2 * H * kvd + qd * H) * L
    mlp = 2 * T * 3 * H * I * L
    attn = 2 * (T * T // 2) * 2 * qd * L  # causal: half the score matrix
    return proj + mlp + attn

def bench_model(name, cfg, ctxs, results):
    print(name, "params(B):", sum(np.prod(s.shape) for s in jax.tree_util.tree_leaves(
        jax.eval_shape(lambda: lm_mod.init_lm(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)))) / 1e9)
    params = structural(cfg)
    for T in ctxs:
        cache_shape = T
        for impl in ("flash", "xla"):
            def run(p, ids):
                embeds = lm_mod.embed_tokens(cfg, p, ids)
                cache = lm_mod.init_kv_cache(cfg, 1, cache_shape)
                logits, cache = lm_mod.prefill(
                    cfg, p, embeds, jnp.ones((1, T), jnp.bool_), cache, attn_impl=impl)
                return logits
            jrun = jax.jit(run)
            rng = np.random.default_rng(0)
            ids = jnp.asarray(rng.integers(5, 100000, (1, T)), jnp.int32)
            try:
                out = jrun(params, ids); jax.block_until_ready(out)
            except Exception as e:
                msg = str(e).split("\n")[0][:120]
                results[f"{name}_{T}_{impl}"] = dict(error=msg)
                print(f"{name} T={T} {impl}: FAILED ({msg})")
                continue
            ts = []
            for i in range(4):
                ids_i = jnp.asarray(rng.integers(5, 100000, (1, T)), jnp.int32)
                t0 = time.perf_counter(); o = jrun(params, ids_i); jax.block_until_ready(o)
                np.asarray(o[0, :4]); ts.append(time.perf_counter() - t0)
            dt = min(ts)
            tps = T / dt
            mfu = prefill_flops(cfg, T) / dt / PEAK
            results[f"{name}_{T}_{impl}"] = dict(ms=dt*1e3, tokens_per_s=tps, mfu=mfu)
            print(f"{name} T={T} {impl}: {dt*1e3:.1f} ms, {tps:,.0f} tok/s/chip, MFU {mfu*100:.1f}%")


def main():
    results = {}
    bench_model("qwen2_7b", C.QWEN2_7B, (4096,), results)   # 8k KV cache + 15.2GB bf16 params exceed 1-chip HBM
    bench_model("llama32_3b", C.LLAMA32_3B, (4096, 8192), results)
    print(json.dumps(results))

if __name__ == "__main__":
    main()
