import time, numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
print("devices:", jax.devices())
from tdc_video_tpu.ops import flash_attention as fa
from tdc_video_tpu.models.layers import sdpa

B, T, Hq, Hkv, D = 1, 8192, 28, 4, 128  # Qwen2-7B geometry
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0, 1, (B, T, Hq, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(0, 1, (B, T, Hkv, D)), jnp.bfloat16)

def loss_flash(q, k, v):
    return jnp.sum(fa.flash_attention(q, k, v, causal=True).astype(jnp.float32) ** 2)

def loss_xla(q, k, v):
    kr = jnp.repeat(k, Hq // Hkv, 2); vr = jnp.repeat(v, Hq // Hkv, 2)
    m = jnp.tril(jnp.ones((T, T), bool))[None, None]
    return jnp.sum(sdpa(q, kr, vr, mask=m).astype(jnp.float32) ** 2)

gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))

t0 = time.time(); dqf, dkf, dvf = gf(q, k, v); jax.block_until_ready(dqf); print(f"flash bwd compile+run {time.time()-t0:.1f}s")
t0 = time.time(); dqx, dkx, dvx = gx(q, k, v); jax.block_until_ready(dqx); print(f"xla bwd compile+run {time.time()-t0:.1f}s")

for name, a, b in [("dq", dqf, dqx), ("dk", dkf, dkx), ("dv", dvf, dvx)]:
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
    print(f"{name}: max-rel {rel:.4f}")

def timeit(f, *args, n=5):
    outs = f(*args); jax.block_until_ready(outs)
    ts = []
    for i in range(n):
        qq = args[0] + jnp.float32(i).astype(args[0].dtype) * 0  # distinct buffer
        t0 = time.perf_counter(); outs = f(qq, *args[1:]); jax.block_until_ready(outs)
        np.asarray(outs[0][0,0,0,0]); ts.append(time.perf_counter() - t0)
    return min(ts)

tf = timeit(gf, q, k, v); tx = timeit(gx, q, k, v)
print(f"fwd+bwd time flash {tf*1e3:.1f}ms xla {tx*1e3:.1f}ms speedup {tx/tf:.2f}x")
