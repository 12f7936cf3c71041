"""Isolated LN+quant micro-bench: Pallas kernel vs XLA composition.

In-jit loop with a data dependence (CLAUDE.md benchmarking honesty): the s8
output feeds back into the next iteration's input via a cheap cast-add, so
nothing hoists.  Roofline for [93312, 1536] bf16->s8 is ~0.33 ms/pass.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from tdc_video_tpu.models.layers import int8_qact, layer_norm
from tdc_video_tpu.ops.ln_quant import ln_quant_int8

R, D = 93312, 1536
ITERS = 50
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(0, 2, (R, D)), jnp.bfloat16)
p = {
    "scale": jnp.asarray(rng.normal(1, 0.1, (D,)), jnp.bfloat16),
    "bias": jnp.asarray(rng.normal(0, 0.1, (D,)), jnp.bfloat16),
}
s = jnp.asarray(0.017, jnp.float32)


def loop(fn):
    @jax.jit
    def run(x, p, s):
        def body(i, x):
            q = fn(p, x, s)
            # data dependence: fold the s8 back into the bf16 stream
            return x + (q.astype(jnp.bfloat16) * jnp.bfloat16(1e-6))
        return jax.lax.fori_loop(0, ITERS, body, x)
    return run


def kernel(p, x, s):
    return ln_quant_int8(p, x, s, eps=1e-6)


def xla(p, x, s):
    return int8_qact(layer_norm(p, x, 1e-6), s)[0]


for name, fn in [("pallas", kernel), ("xla", xla)]:
    run = loop(fn)
    out = run(x0, p, s)
    np.asarray(out[0, :4])  # warm
    t0 = time.perf_counter()
    out = run(x0 + jnp.bfloat16(0.01), p, s)
    np.asarray(out[0, :4])
    dt = (time.perf_counter() - t0) / ITERS * 1000
    gbps = (R * D * 3) / (dt / 1000) / 1e9  # 2B read + 1B write per pass
    print(f"{name:7s}: {dt:7.3f} ms/pass  ({gbps:6.1f} GB/s effective)")
