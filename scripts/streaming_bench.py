"""10-minute end-to-end streaming ingestion benchmark (PERF.md).

Synthesizes a 10-min MPEG-4 at source fps, then runs StreamingEncoder
(decode chunk t+1 on the host || encode chunk t on the TPU) + final TDC
compression, reporting video-sec/sec. Honest timing: structural zero params
passed as jit ARGS (never captured constants — see PERF.md gotchas).
"""
import os, sys, time, dataclasses, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

def main():
    from tdc_video_tpu import config as C
    from tdc_video_tpu.media.io import encode_test_video
    from tdc_video_tpu.serving.streaming import StreamingEncoder
    from bench import build

    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    src_fps = 24.0
    n_frames = int(minutes * 60 * src_fps)
    path = os.path.join(tempfile.gettempdir(), f"stream_fixture_{int(minutes)}m.mp4")
    if not os.path.exists(path):
        t0 = time.time()
        encode_test_video(path, 480, 360, fps=src_fps, n_frames=n_frames)
        print(f"fixture: {path} ({os.path.getsize(path)/1e6:.1f} MB, {time.time()-t0:.0f}s to encode)")

    cfg = dataclasses.replace(C.tdc_qwen2_7b(), param_dtype=jnp.bfloat16)
    params = build(cfg)
    enc = StreamingEncoder(cfg, params, chunk_frames=32, max_frames=1000)
    # warmup compile on a tiny range so the timed run measures steady state
    ff, df, fm, ts, st = enc.encode_stream(path, fps=1.0)
    visual, n, comp_s = enc.compress(ff, df, fm)
    jax.block_until_ready(visual)
    print("warmup:", st.summary(), f"compress {comp_s:.2f}s (incl. compile)")
    t0 = time.perf_counter()
    ff, df, fm, ts, st = enc.encode_stream(path, fps=1.0)
    visual, n, comp_s = enc.compress(ff, df, fm)
    wall = time.perf_counter() - t0
    video_sec = st.frames  # 1 fps
    print("steady:", st.summary(), f"compress {comp_s:.2f}s")
    print(f"E2E {minutes:.0f}-min video: {wall:.1f}s wall -> {video_sec/wall:.1f}x realtime")

if __name__ == "__main__":
    main()
