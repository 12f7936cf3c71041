import sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from tdc_video_tpu import config as C
from tdc_video_tpu.model import init_tdc, tdc_loss
cfg = C.tdc_tiny()
params = init_tdc(jax.random.PRNGKey(0), cfg)
B, T, L = 1, 4, 160
rng = np.random.default_rng(0)
labels = np.full((B, L), -100, np.int32); labels[:, 60:] = rng.integers(2, 90, (B, L-60))
batch = {
    "input_ids": jnp.asarray(rng.integers(2, 90, (B, L)), jnp.int32),
    "labels": jnp.asarray(labels),
    "image_pos": jnp.full((B,), 5, jnp.int32),
    "siglip_px": jnp.asarray(rng.normal(0, 1, (B, T, cfg.siglip.image_size, cfg.siglip.image_size, 3)), jnp.float32),
    "dino_px": jnp.asarray(rng.normal(0, 1, (B, T, cfg.dino.image_size, cfg.dino.image_size, 3)), jnp.float32),
    "frame_mask": jnp.ones((B, T), jnp.bool_),
    "qformer_text_ids": jnp.asarray(rng.integers(1, 50, (B, 6)), jnp.int32),
    "qformer_text_mask": jnp.ones((B, 6), jnp.bool_),
}
def loss_fn(p, impl):
    return tdc_loss(cfg, p, batch, max_len=256, max_visual_len=128, attn_impl=impl, remat=True)
gf = jax.jit(jax.value_and_grad(lambda p: loss_fn(p, "flash")))
gx = jax.jit(jax.value_and_grad(lambda p: loss_fn(p, "xla")))
lf, grf = gf(params); jax.block_until_ready(lf)
lx, grx = gx(params); jax.block_until_ready(lx)
print("loss flash", float(lf), "xla", float(lx))
d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()), grf, grx)
mx = max(jax.tree_util.tree_leaves(d))
print("max grad abs-diff flash vs xla:", mx)
assert np.isfinite(float(lf))
print("TRAIN FLASH OK")
