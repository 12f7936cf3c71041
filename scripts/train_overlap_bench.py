"""Training host/device overlap benchmark (VERDICT-r2 item 3).

A/B on real hardware: the same train loop with (a) inline host batch prep +
per-step loss fetch (the old behavior / the reference's no-worker path) vs
(b) Trainer.fit's prefetch thread + deferred loss.  Host work is emulated
with a sleep roughly matching video-decode/tokenize cost; the device step is
a real jitted TDC train step on a small-but-not-trivial config.

Usage: python scripts/train_overlap_bench.py [host_ms] [n_steps]
"""
import os, sys, time, dataclasses, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tdc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import numpy as np, jax.numpy as jnp


def main():
    from tdc_video_tpu.config import tdc_tiny
    from tdc_video_tpu.model import init_tdc
    from tdc_video_tpu.train.trainer import TrainConfig, Trainer

    host_ms = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    # tiny config with a fat batch so the device step is comparable to the
    # emulated host work
    cfg = tdc_tiny()
    # host-resident master copy: each Trainer gets fresh device buffers
    # (the jitted step donates its params/opt_state)
    params = jax.tree_util.tree_map(np.asarray, init_tdc(jax.random.PRNGKey(0), cfg))
    out = tempfile.mkdtemp()

    rng = np.random.default_rng(0)

    def make_batch():
        time.sleep(host_ms / 1e3)  # emulated host pipeline (decode/tokenize)
        B, T, L = 8, 8, 64
        labels = np.full((B, L), -100, np.int32)
        labels[:, 16:] = rng.integers(2, 100, (B, L - 16))
        return {
            "input_ids": rng.integers(2, 100, (B, L)).astype(np.int32),
            "labels": labels,
            "image_pos": np.full((B,), 5, np.int32),
            "siglip_px": rng.normal(0, 1, (B, T, cfg.siglip.image_size, cfg.siglip.image_size, 3)).astype(np.float32),
            "dino_px": rng.normal(0, 1, (B, T, cfg.dino.image_size, cfg.dino.image_size, 3)).astype(np.float32),
            "frame_mask": np.ones((B, T), bool),
            "qformer_text_ids": rng.integers(1, 50, (B, 8)).astype(np.int32),
            "qformer_text_mask": np.ones((B, 8), bool),
        }

    def trainer(max_steps):
        tcfg = TrainConfig(
            output_dir=out, max_steps=max_steps, logging_steps=10**9,
            save_steps=10**9, gradient_accumulation_steps=1,
            model_max_length=256, max_visual_len=128, report_to="none",
        )
        return Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.asarray, params),
                       total_steps=max_steps)

    # warm the compile once
    tr = trainer(1)
    tr.train_step(make_batch())

    # (a) inline: host prep serialized with the device step + loss fetch
    tr = trainer(n_steps)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        loss = tr.train_step(make_batch())
        float(loss)  # the reference's per-step loss.item() sync
    tr.save()  # fit() ends with a save; keep the A/B fair
    dt_a = time.perf_counter() - t0

    # (b) fit(): prefetch thread + deferred loss
    tr = trainer(n_steps)
    t0 = time.perf_counter()
    tr.fit(make_batch() for _ in range(n_steps + 4))
    dt_b = time.perf_counter() - t0

    print(f"host work {host_ms:.0f} ms/batch, {n_steps} steps:")
    print(f"  inline (serialized):  {dt_a:.2f}s  -> {n_steps/dt_a:.2f} steps/s")
    print(f"  fit() (prefetch):     {dt_b:.2f}s  -> {n_steps/dt_b:.2f} steps/s")
    print(f"  speedup: {dt_a/dt_b:.2f}x")


if __name__ == "__main__":
    main()
