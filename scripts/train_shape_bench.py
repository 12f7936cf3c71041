"""Training throughput at REFERENCE shapes on the real chip (VERDICT r4 #2).

Two configurations that fit a single v5e-16GB chip:

  stage3 — the reference's scripts/stage3/train_video_audio_qwen_lora.sh
           shape on the 3B family: LoRA r=128/alpha=256 over a FROZEN bf16
           Llama-3.2-3B + frozen towers + BEATs in-graph, flash attention,
           remat, bs 1 x accum 2, 8k tokens, T video frames + audio windows.
           (/root/reference/scripts/stage3/train_video_audio_qwen_lora.sh:8-9,56-61)
  stage1 — the reference's stage-1 image alignment shape: adapter-only tune
           (tune_mm_mlp_adapter; LM + towers frozen), bs 8, 1 frame, 1k text.
           (/root/reference/scripts/stage1/train_image_qwen.sh)

Reference full-tune stages that do NOT fit one chip (documented arithmetic,
PERF.md): stage-2 full-tune needs params + grads + AdamW moments =
4x param bytes in bf16 — 7B: 61 GB, 3B: 26 GB (+ MultiSteps accumulator
+6.4 GB) vs 15.75 GB HBM.  Those run on a mesh: the driver dryrun jits the
same step TP+FSDP over n devices (__graft_entry__.dryrun_multichip).

Measures per micro-step wall (one fwd+bwd+masked-update), reports steps/s,
padded tokens/s, and an explicit-FLOP-model MFU (counting: LM fwd 2*N*tok
with causal attention, bwd 2x fwd when weights train / 1x when frozen
(activation grads only), towers fwd-only when nothing upstream trains,
+1 fwd for remat of the LM).  Random weights/data passed as jit args.

Usage: python scripts/train_shape_bench.py [stage3|stage1] [n_steps] [frames] [seq_len]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tdc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import dataclasses
import tempfile

import numpy as np
import jax.numpy as jnp

PEAK = 197e12  # v5e bf16


def gemm_flops_lm(cfg, tokens):
    """fwd matmul+attention FLOPs for `tokens` through the LM."""
    lm = cfg.lm
    h, L = lm.hidden_size, lm.num_layers
    hd = h // lm.num_heads
    qkvo = 2 * tokens * h * (h + 2 * lm.num_kv_heads * hd + h)
    mlp = 2 * tokens * h * lm.intermediate_size * 3
    attn = 2 * 2 * tokens * tokens * h / 2  # causal: half the [T,T] scores
    head = 2 * tokens * h * lm.vocab_size
    return L * (qkvo + mlp + attn) + head


def gemm_flops_vit(vcfg, n_frames):
    n_tok = (vcfg.image_size // vcfg.patch_size) ** 2 + (1 if vcfg.name == "siglip" else 0)
    h, L = vcfg.hidden_size, vcfg.num_layers
    mlp_mult = 3 if getattr(vcfg, "swiglu", False) else 2
    qkvo = 2 * n_tok * h * 4 * h
    mlp = 2 * n_tok * h * vcfg.intermediate_size * mlp_mult
    attn = 2 * 2 * n_tok * n_tok * h
    return n_frames * L * (qkvo + mlp + attn)


def main():
    from tdc_video_tpu import config as C
    from tdc_video_tpu.model import init_tdc
    from tdc_video_tpu.train.trainer import TrainConfig, Trainer

    mode = sys.argv[1] if len(sys.argv) > 1 else "stage3"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    T = int(sys.argv[3]) if len(sys.argv) > 3 else (1 if mode == "stage1" else 128)

    audio = mode.startswith("stage3")
    cfg = C.tdc_llama32_3b(audio=audio) if audio else C.tdc_llama32_3b()
    cfg = dataclasses.replace(cfg, param_dtype=jnp.bfloat16)

    if mode.startswith("stage3"):
        B = 1
        L = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
        MAX_VIS = min(4096, L // 2)
        tcfg = TrainConfig(
            output_dir=tempfile.mkdtemp(prefix="tsb3_"),
            learning_rate=5e-6, lora_enable=True, lora_r=128, lora_alpha=256,
            gradient_accumulation_steps=2, model_max_length=L,
            max_visual_len=MAX_VIS, report_to="none", logging_steps=10**9,
            save_steps=10**9, loss_chunk=256,
            # "stage3-int8": frozen base as weight-only int8 (QLoRA analog) —
            # the bf16 base + opt state alone is 14.6 GB of args on a
            # 15.75 GB chip (XLA memory dump, PERF.md round 5)
            quantize_frozen="int8" if mode == "stage3-int8" else None,
        )
    else:
        B, L = 8, 1024
        MAX_VIS = 640
        tcfg = TrainConfig(
            output_dir=tempfile.mkdtemp(prefix="tsb1_"),
            learning_rate=4e-5, tune_mm_mlp_adapter=True,
            unfreeze_mm_compressor=False, gradient_accumulation_steps=1,
            model_max_length=L, max_visual_len=MAX_VIS, report_to="none",
            logging_steps=10**9, save_steps=10**9, loss_chunk=256,
        )

    print(f"{mode}: Llama-3.2-3B bf16, B={B} L={L} T={T} frames "
          f"max_vis={MAX_VIS} accum={tcfg.gradient_accumulation_steps} "
          f"lora={tcfg.lora_enable}", flush=True)

    t0 = time.time()
    # pass the freshly-initialized tree STRAIGHT into the trainer: under
    # quantize_frozen the trainer replaces the float base with int8, and a
    # caller-held reference would keep the original bf16 tree (9.5 GB at 3B)
    # resident through optimizer-state init — a runtime OOM the compile-time
    # memory assignment never sees
    trainer = Trainer(
        cfg, tcfg, init_tdc(jax.random.PRNGKey(0), cfg), total_steps=max(n_steps, 2)
    )
    print(f"init+trainer: {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    labels = np.full((B, L), -100, np.int32)
    labels[:, L // 2 :] = rng.integers(2, 1000, (B, L - L // 2))
    batch = {
        "input_ids": rng.integers(2, 1000, (B, L)).astype(np.int32),
        "labels": labels,
        "image_pos": np.full((B,), 5, np.int32),
        "text_len": np.full((B,), L, np.int32),
        "has_image": np.ones((B,), bool),
        "siglip_px": rng.normal(0, 1, (B, T, cfg.siglip.image_size, cfg.siglip.image_size, 3)).astype(np.float32),
        "dino_px": rng.normal(0, 1, (B, T, cfg.dino.image_size, cfg.dino.image_size, 3)).astype(np.float32),
        "frame_mask": np.ones((B, T), bool),
        "qformer_text_ids": rng.integers(1, 1000, (B, 32)).astype(np.int32),
        "qformer_text_mask": np.ones((B, 32), bool),
    }
    if audio:
        secs = T  # 1 fps
        W = max(1, (secs + 9) // 10)
        S = W * 10
        batch.update({
            "audio_windows": rng.normal(0, 0.05, (B, W, 160000)).astype(np.float32),
            "audio_wmask": np.ones((B, W, 160000), bool),
            "audio_frame_of_sec": np.clip(np.arange(S), 0, T - 1)[None].repeat(B, 0).astype(np.int32),
            "audio_group_pos": np.zeros((B, S), np.int32),
            "audio_group_size": np.ones((B, T), np.int32),
            "audio_sec_valid": (np.arange(S) < secs)[None].repeat(B, 0),
        })

    if os.environ.get("PROBE_MEM"):
        # AOT compile + memory_analysis WITHOUT executing: shows the
        # compiler's exact argument/output/temp accounting even when the
        # program fits assignment but OOMs at runtime (resident buffers the
        # assignment never sees).
        padded = trainer._pad_batch(batch)
        jstep, b_spec = trainer._make_step(padded)
        import jax.numpy as jnp2
        from tdc_video_tpu.parallel.sharding import shard_tree as _st
        b = {k: jnp.asarray(v) for k, v in padded.items()}
        frozen = {
            k: v for k, v in trainer.params.items()
            if trainer.lora is None or k not in trainer._extra_keys
        } if trainer.lora is not None else {}
        with trainer.mesh:
            lowered = jstep.lower(trainer._opt_params(), frozen, trainer.opt_state, b)
            compiled = lowered.compile()
        ma = compiled.memory_analysis()
        print(f"memory_analysis: {ma}", flush=True)
        for name in dir(ma):
            if name.endswith("_size_in_bytes"):
                print(f"  {name}: {getattr(ma, name)/2**30:.2f} GiB", flush=True)
        return

    t0 = time.time()
    loss = trainer.train_step(batch)
    print(f"compile+step0: {time.time()-t0:.0f}s loss={float(loss):.4f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        loss = trainer.train_step(batch)
    float(loss)  # sync
    dt = time.perf_counter() - t0
    sps = n_steps / dt
    tokps = sps * B * L

    # FLOP model (see module docstring)
    lm_tok = B * L
    lm_fwd = gemm_flops_lm(cfg, lm_tok)
    lm_mult = (2 if tcfg.lora_enable or tcfg.tune_mm_mlp_adapter else 3) + 1  # +1 remat
    tower_fwd = gemm_flops_vit(cfg.siglip, B * T) + gemm_flops_vit(cfg.dino, B * T)
    tower_mult = 1  # frozen, nothing upstream trains
    flops = lm_fwd * lm_mult + tower_fwd * tower_mult
    mfu = flops * sps / PEAK

    print(f"\n{mode}: {sps:.3f} micro-steps/s ({dt/n_steps*1e3:.0f} ms/step), "
          f"{tokps:,.0f} padded tok/s, est. MFU {mfu*100:.1f}% "
          f"(FLOP model: LM x{lm_mult}, towers x{tower_mult}; "
          f"{flops/1e12:.2f} TF/step)")


if __name__ == "__main__":
    main()
