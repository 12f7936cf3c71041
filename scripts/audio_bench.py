"""Audio encode throughput: kaldi fbank + BEATs + pooling on the real chip.

The reference runs BEATs eagerly in fp32 over 10-s windows
(/root/reference/tdc/audio_models/beats/BEATs.py:116-177, ~50 tok/sec of
audio) and 2 of its 7 benchmarks + the demo (main.py:44,60) are
audio-visual; this measures our jitted model.encode_audio path
(fbank -> BEATs -> second pooling -> audio_proj) in audio-seconds/sec.

Honest methodology (PERF.md rules): random weights + waveforms passed as
jit args, distinct inputs per iteration, value fetches; reports per-window
batch sizes bracketing the demo (1 min) and benchmark (10 min) shapes.

Usage: python scripts/audio_bench.py [7b|3b] [iters]
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

import numpy as np
import jax.numpy as jnp


def main():
    from tdc_video_tpu import config as C
    from tdc_video_tpu.model import encode_audio, init_tdc
    from tdc_video_tpu.ops.audio import second_groups

    which = sys.argv[1] if len(sys.argv) > 1 else "7b"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    cfg = {"7b": C.tdc_qwen2_7b, "3b": C.tdc_llama32_3b}[which](audio=True)
    cfg = dataclasses.replace(cfg, param_dtype=jnp.bfloat16)

    shapes = jax.eval_shape(lambda: init_tdc(jax.random.PRNGKey(0), cfg))
    aparams = {
        "beats": jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes["beats"]
        ),
        "audio_proj": jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes["audio_proj"]
        ),
    }
    rng = np.random.default_rng(0)

    for W in (6, 30, 60):  # 1 / 5 / 10 minutes of audio
        secs = W * 10
        T = secs  # 1 fps video: one frame per second
        keep = np.ones(secs, np.int64)
        f, p, g = second_groups(keep)
        f = np.clip(f, 0, T - 1)
        if len(g) < T:
            g = np.concatenate([g, np.ones(T - len(g), np.int32)])
        sv = np.ones(secs, bool)

        jfn = jax.jit(
            lambda prm, w, m: encode_audio(
                cfg, prm, w, m, jnp.asarray(f), jnp.asarray(p),
                jnp.asarray(g[:T]), T, sec_valid=jnp.asarray(sv),
            )
        )
        wmask = jnp.ones((W, 160000), bool)
        # pre-stage the waveform on device and salt it there per iteration:
        # the axon tunnel's host->device bandwidth would otherwise dominate
        # large-W batches (38 MB/iter at W=60) and misattribute transfer
        # time to the encode (a real host feeds from local RAM)
        wav0 = jax.device_put(
            jnp.asarray(rng.normal(0, 0.05, (W, 160000)), jnp.float32)
        )
        salt = jax.jit(lambda w, i: w + i * 1e-6)
        np.asarray(jfn(aparams, salt(wav0, 0.0), wmask))  # warmup/compile

        t0 = time.perf_counter()
        for i in range(iters):
            out = jfn(aparams, salt(wav0, float(i + 1)), wmask)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{which} BEATs: {W:3d} windows ({secs:4d} s audio) -> "
              f"{dt*1e3:8.1f} ms  = {secs/dt:8.1f} audio-sec/sec  "
              f"(tokens {out.shape})", flush=True)


if __name__ == "__main__":
    main()
