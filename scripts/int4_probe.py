"""Probe: does streaming 4-bit weights from HBM beat int8 on this TPU?

Decode is weight-streaming-bound, so a batch-1 dequant-inline int4 matvec
should approach 2x the int8 one if the S4 HBM layout is real.  The axon
tunnel runtime cannot take S4 arrays across the host boundary (recursive-jit
error on S4 arg signatures), so the int4 copies are materialized INSIDE the
jit from an int8 arg behind an optimization_barrier, then streamed by an
in-jit scan (ITERS matvecs with a data dependence) — the one-time convert
amortizes away.  A packed-uint8 (2 nibbles/byte) + in-graph unpack variant
is probed too, as the fallback representation if S4 stays runtime-blocked.

Times one 7B-decode-shaped matvec for bf16 / int8 / int4 / int4+group-scales
/ packed-nibble.  Decides whether a 4-bit serving path (reference load_4bit,
tdc/builder.py:58-67) is worth building.

Usage: python scripts/int4_probe.py [H] [F] [iters]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tdc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np

H = int(sys.argv[1]) if len(sys.argv) > 1 else 3584
F = int(sys.argv[2]) if len(sys.argv) > 2 else 18944  # qwen2-7b mlp up dim
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 50
G = 128


K = 6  # distinct weight copies chained per scan step: amortizes the ~0.6 ms
# per-iteration overhead that otherwise swamps the stream time at this size


def loop(prep, body):
    """jit( prep(args) -> K streamed weight copies; scan ITERS x body-chain )"""

    def fn(x, *ws):
        # K independent copies (salted so none can be CSE'd away), each
        # materialized in HBM behind the barrier: one step streams K weights
        wks = [
            jax.lax.optimization_barrier(
                prep(*[w + i if w.dtype != jnp.float32 else w for w in ws])
            )
            for i in range(K)
        ]

        def step(c, _):
            for wk in wks:
                y = body(c, *wk) if isinstance(wk, tuple) else body(c, wk)
                c = y[:, :H] * 1e-3 + c
            return c, None

        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    return jax.jit(fn)


def timeit(name, fn, x, *ws):
    fn(x, *ws).block_until_ready()
    ts = []
    for i in range(5):
        xi = x + i * 1e-3
        t0 = time.perf_counter()
        fn(xi, *ws).block_until_ready()
        ts.append(time.perf_counter() - t0)
    per = min(ts) / (ITERS * K)
    gb = bytes_of[name] / 1e9
    print(f"{name:12s}: {per*1e3:7.3f} ms/matvec  ({gb/per:.0f} GB/s apparent)")
    return per


rng = np.random.default_rng(0)
wf = rng.normal(0, 0.02, (H, F)).astype(np.float32)
x = jnp.asarray(rng.normal(0, 1, (1, H)), jnp.bfloat16)

w_bf = jnp.asarray(wf, jnp.bfloat16)
scale8 = jnp.asarray(np.maximum(np.abs(wf).max(0) / 127, 1e-8), jnp.float32)
w_q8 = jnp.asarray(np.clip(np.round(wf / np.asarray(scale8)[None]), -127, 127), jnp.int8)
g4 = np.maximum(np.abs(wf.reshape(H // G, G, F)).max(1) / 7.0, 1e-8)
q4_np = np.clip(
    np.round(wf.reshape(H // G, G, F) / g4[:, None, :]), -7, 7
).reshape(H, F).astype(np.int8)
w_q4_i8 = jnp.asarray(q4_np, jnp.int8)
gscale = jnp.asarray(g4, jnp.float32)
# packed nibbles: rows 2k and 2k+1 share a byte (lo, hi); unsigned storage
packed_np = ((q4_np[0::2] + 8) | ((q4_np[1::2] + 8) << 4)).astype(np.uint8)
w_pk = jnp.asarray(packed_np)  # [H//2, F]

bytes_of = {
    "bf16": H * F * 2,
    "int8": H * F,
    "int4": H * F // 2,
    "int4+gs": H * F // 2 + (H // G) * F * 4,
    "packed-u8": H * F // 2,
}

ident = lambda *w: w
timeit("bf16", loop(ident, lambda c, w: c @ w), x, w_bf)
timeit(
    "int8",
    loop(ident, lambda c, w, s: (c @ w.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16)),
    x, w_q8, scale8,
)
timeit(
    "int4",
    loop(lambda w: (w.astype(jnp.int4),), lambda c, w: c @ w.astype(jnp.bfloat16)),
    x, w_q4_i8,
)


def gs_body(c, w, gs):
    wd = w.astype(jnp.bfloat16).reshape(H // G, G, F) * gs.astype(jnp.bfloat16)[:, None, :]
    return c @ wd.reshape(H, F)


timeit(
    "int4+gs",
    loop(lambda w, gs: (w.astype(jnp.int4), gs), gs_body),
    x, w_q4_i8, gscale,
)


def unpack_body(c, w):
    lo = (w & 0xF).astype(jnp.int8) - 8
    hi = (w >> 4).astype(jnp.int8) - 8
    wd = jnp.stack([lo, hi], axis=1).reshape(H, F).astype(jnp.bfloat16)
    return c @ wd


timeit("packed-u8", loop(ident, unpack_body), x, w_pk)
