"""Continuous-batching throughput: aggregate decode tok/s at 1/2/4 slots.

Drives serving.batching.DecodeEngine end-to-end (admission -> shared-slot
prefill -> chunked lockstep decode -> harvest) with structural int8 weights
passed as jit args (honest; PERF.md gotchas).  The per-slot marginal cost of
lockstep decode is small at the HBM roofline (weights stream once per step
regardless of batch), so aggregate tok/s should scale nearly linearly until
the MXU or cache traffic saturates — this script measures where.

Usage: python scripts/engine_bench.py [3b|7b] [kv8] [spec] [sampled] [prefix] [stall]

`spec` runs the speculative lockstep (spec_window=8) at the full-acceptance
ceiling (zero weights decode the constant token 0; prompts end in a run of
0s so every lookup hits — same construction as spec_bench.py).

`prefix` measures shared-prefix admission instead: 4 requests with a
3584-token common prefix + 128-token distinct suffixes (the multi-question
video QA shape), full per-request prefill vs prefill-once + per-suffix
extend (Request.prefix_key).

`stall` measures chunked admission (prefill_chunk): one stream decodes 256
tokens while 3584-token prompts keep arriving into the second slot; the
metric is the max gap between decode-chunk harvests — the worst stutter the
active stream sees — one-shot prefill vs prefill_chunk=512.
"""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tdc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import numpy as np, jax.numpy as jnp


def run(which, lm_cfg, kv_quant, spec=0, temperature=0.0):
    from tdc_video_tpu import config as C
    from tdc_video_tpu.models import lm as lm_mod
    from tdc_video_tpu.models.quant import quantize_lm_int8
    from tdc_video_tpu.serving.batching import DecodeEngine, Request

    cfg = dataclasses.replace(C.tdc_tiny(), lm=lm_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: lm_mod.init_lm(jax.random.PRNGKey(0), lm_cfg, dtype=jnp.bfloat16)
    )
    shapes = jax.eval_shape(quantize_lm_int8, shapes)
    lm_params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = {"lm": lm_params}

    L, NEW = 512, 64
    rng = np.random.default_rng(0)

    def make_req(i):
        if spec:
            ids_np = np.full((1, L), 7, np.int64)
            ids_np[:, L // 2 :] = 0  # full-acceptance ceiling (see docstring)
            ids = jnp.asarray(ids_np, jnp.int32)
        else:
            ids = jnp.asarray(rng.integers(5, 1000, (1, L)), jnp.int32)
        embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], ids, cfg.dtype)
        # distinct embeds per request: the axon runtime memoizes identical
        # (executable, args) executions
        embeds = embeds + jnp.asarray(1e-3 * (i + 1), cfg.dtype)
        return Request(
            embeds=embeds, attn_mask=jnp.ones((1, L), bool),
            max_new_tokens=NEW, uid=i,
            prompt_ids=np.asarray(ids[0]) if spec else None,
            temperature=temperature, top_k=50, seed=i,
        )

    for slots in (1, 2, 4):
        eng = DecodeEngine(
            cfg, params, num_slots=slots, capacity=L + NEW + max(spec - 1, 0),
            chunk_tokens=16 // max(spec, 1) or 1, attn_impl="flash",
            kv_quant=kv_quant, spec_window=spec,
        )
        # warm all compiles (prefill + chunk), then reset so timed-run
        # telemetry (steps, chunk_spans) is not polluted by warmup
        eng.submit(make_req(100))
        eng.run()
        eng.reset()
        reqs = [make_req(i) for i in range(slots)]
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r)
        done = eng.run()
        dt = time.perf_counter() - t0
        n_tok = sum(len(r.tokens) for r in done)
        kv = f"+kv{kv_quant}" if kv_quant else ""
        sp = f"+spec{spec}" if spec else ""
        sp += f"+T{temperature}" if temperature else ""

        # Steady-state decode column: wall tok/s entangles the serialized
        # per-request prefills and this host's ~30 ms/dispatch tunnel
        # latency, so it is not comparable across tunnels/hosts.  chunk_spans
        # time each jitted decode chunk dispatch->harvest (admission/prefill
        # between chunks excluded); per-chunk overhead beyond compute is the
        # harvest fetch (~1 dispatch RTT), printed for context.
        spans = eng.chunk_spans
        dev_t = sum(t1 - t0_ for t0_, t1, _ in spans)
        dev_tok = sum(n for _, _, n in spans)
        dev_rate = dev_tok / max(dev_t, 1e-9)
        per_chunk = dev_t / max(len(spans), 1)
        print(
            f"{which} int8{kv}{sp} slots={slots}: {n_tok} tokens in {dt*1e3:.0f} ms "
            f"-> {n_tok/dt:.1f} tok/s wall ({n_tok/dt/slots:.1f}/slot); "
            f"decode {dev_rate:.1f} tok/s steady-state "
            f"({dev_tok} tok / {len(spans)} chunks, {per_chunk*1e3:.0f} ms/chunk "
            f"incl 1 fetch RTT)"
        )


def run_prefix(which, lm_cfg, kv_quant):
    from tdc_video_tpu import config as C
    from tdc_video_tpu.models import lm as lm_mod
    from tdc_video_tpu.models.quant import quantize_lm_int8
    from tdc_video_tpu.serving.batching import DecodeEngine, Request

    cfg = dataclasses.replace(C.tdc_tiny(), lm=lm_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: lm_mod.init_lm(jax.random.PRNGKey(0), lm_cfg, dtype=jnp.bfloat16)
    )
    shapes = jax.eval_shape(quantize_lm_int8, shapes)
    lm_params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = {"lm": lm_params}

    P, SUF, NEW, SLOTS = 3584, 128, 64, 4
    L = P + SUF
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 1000, (1, L)), jnp.int32)
    base = lm_mod.embed_tokens(cfg.lm, params["lm"], ids, cfg.dtype)
    suf_mask = (jnp.arange(L) >= P)[None, :, None].astype(cfg.dtype)

    def make_req(i, share, key):
        # distinct suffixes, IDENTICAL prefix (the multi-question shape); the
        # offset also defeats the axon runtime's execution memoization
        e = base + suf_mask * jnp.asarray(1e-3 * (i + 1), cfg.dtype)
        return Request(
            embeds=e, attn_mask=jnp.ones((1, L), bool), max_new_tokens=NEW,
            uid=i, prefix_key=key if share else None, prefix_len=P if share else 0,
        )

    cap = int(np.ceil((L + NEW) / 128) * 128)
    for share in (False, True):
        eng = DecodeEngine(
            cfg, params, num_slots=SLOTS, capacity=cap,
            chunk_tokens=16, attn_impl="flash", kv_quant=kv_quant,
        )
        # warm all compiles on a throwaway key, then time with a fresh key so
        # the shared run pays its one real prefix prefill inside the window
        eng.submit(make_req(100, share, "warm"))
        eng.run()
        reqs = [make_req(i, share, "timed") for i in range(SLOTS)]
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r)
        done = eng.run()
        dt = time.perf_counter() - t0
        n_tok = sum(len(r.tokens) for r in done)
        label = "shared-prefix" if share else "full-prefill "
        print(
            f"{which} int8 {label} slots={SLOTS} P={P} suf={SUF}: {n_tok} tokens "
            f"in {dt*1e3:.0f} ms -> {n_tok/dt:.1f} tok/s aggregate "
            f"(prefix_prefills={eng.prefix_prefills})"
        )


def run_stall(which, lm_cfg, kv_quant):
    from tdc_video_tpu import config as C
    from tdc_video_tpu.models import lm as lm_mod
    from tdc_video_tpu.models.quant import quantize_lm_int8
    from tdc_video_tpu.serving.batching import DecodeEngine, Request

    cfg = dataclasses.replace(C.tdc_tiny(), lm=lm_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: lm_mod.init_lm(jax.random.PRNGKey(0), lm_cfg, dtype=jnp.bfloat16)
    )
    shapes = jax.eval_shape(quantize_lm_int8, shapes)
    lm_params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = {"lm": lm_params}

    P_LONG, P_STREAM, NEW_STREAM, NEW_LONG = 3584, 512, 256, 8
    rng = np.random.default_rng(0)

    def make_req(i, L, new):
        ids = jnp.asarray(rng.integers(5, 1000, (1, L)), jnp.int32)
        e = lm_mod.embed_tokens(cfg.lm, params["lm"], ids, cfg.dtype)
        e = e + jnp.asarray(1e-3 * (i + 1), cfg.dtype)  # defeat axon memoization
        return Request(embeds=e, attn_mask=jnp.ones((1, L), bool), max_new_tokens=new, uid=i)

    cap = int(np.ceil((P_LONG + NEW_STREAM) / 128) * 128)
    for chunk in (0, 512):
        eng = DecodeEngine(
            cfg, params, num_slots=2, capacity=cap, chunk_tokens=8,
            attn_impl="flash", kv_quant=kv_quant, prefill_chunk=chunk,
        )
        # warm every compile: stream prefill, long prompt (one-shot AND
        # chunked ragged-first/full chunks), decode chunk
        eng.submit(make_req(100, P_STREAM, 4))
        eng.submit(make_req(101, P_LONG, 2))
        eng.run()
        eng.chunk_times.clear()
        # one long-lived decode stream + arrivals of heavy prompts that each
        # finish fast and free the slot for the next arrival
        eng.submit(make_req(0, P_STREAM, NEW_STREAM))
        for i in range(1, 4):
            eng.submit(make_req(i, P_LONG, NEW_LONG))
        t0 = time.perf_counter()
        done = eng.run()
        dt = time.perf_counter() - t0
        gaps = np.diff(np.asarray(eng.chunk_times)) * 1e3
        n_tok = sum(len(r.tokens) for r in done)
        label = f"prefill_chunk={chunk}" if chunk else "one-shot prefill "
        print(
            f"{which} int8 {label}: {n_tok} tokens in {dt*1e3:.0f} ms; "
            f"decode-chunk gaps ms: p50={np.percentile(gaps, 50):.0f} "
            f"p95={np.percentile(gaps, 95):.0f} max={gaps.max():.0f} "
            f"(chunks={len(gaps) + 1}, prefill_chunks={eng.prefill_chunks})"
        )


if __name__ == "__main__":
    from tdc_video_tpu import config as C

    which = sys.argv[1] if len(sys.argv) > 1 else "3b"
    lm = C.LLAMA32_3B if which == "3b" else C.QWEN2_7B
    kv = "int8" if "kv8" in sys.argv[2:] else None
    if "prefix" in sys.argv[2:]:
        run_prefix(which, lm, kv)
    elif "stall" in sys.argv[2:]:
        run_stall(which, lm, kv)
    else:
        spec = 8 if "spec" in sys.argv[2:] else 0
        # `sampled`: per-request temperature 1.0.  With `spec`, zero weights
        # give a UNIFORM warped target, so draft acceptance is ~1/vocab —
        # this measures the sampled-spec FLOOR (verify overhead with nothing
        # accepted); the ceiling equals the greedy spec ceiling (acceptance
        # -> 1 as the target sharpens / temperature -> 0), and expected-case
        # acceptance = p_temp(draft) needs real checkpoint logits (blocked,
        # TODO.md).
        temperature = 1.0 if "sampled" in sys.argv[2:] else 0.0
        run(which, lm, kv, spec, temperature)
