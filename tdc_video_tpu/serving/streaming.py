"""Streaming video ingestion: host decode overlaps device encode.

The reference decodes the whole video, then encodes, then compresses, then
prefills — strictly sequential (main.py:28-60).  Here the pipeline is:

    [host thread]   decode + preprocess chunk t+1      (C++ ffmpeg + PIL)
    [device]        towers+SVA encode of chunk t       (one jitted call)
    ...
    [device]        segmentation + TDC compression     (once, over all feats)

so a 10-minute video's encode hides behind its own decode (BASELINE.json
north star: >= 1x playback end-to-end).  Chunks use one static shape
(`chunk_frames`) so the encode step compiles exactly once.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Iterator, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import TDCConfig
from ..data.images import device_preprocess, process_frames
from ..model import encode_frames, prepare_visual


@dataclass
class StreamStats:
    decode_s: float = 0.0
    preprocess_s: float = 0.0
    encode_s: float = 0.0
    compress_s: float = 0.0
    wall_s: float = 0.0
    frames: int = 0

    def summary(self) -> dict:
        vs = self.frames / self.wall_s if self.wall_s else 0.0
        return {
            "frames": self.frames,
            "wall_s": round(self.wall_s, 3),
            "video_sec_per_sec": round(vs, 2),
            "decode_s": round(self.decode_s, 3),
            "encode_s": round(self.encode_s, 3),
            "compress_s": round(self.compress_s, 3),
        }


def _emit_chunk(out_q, chunk, ts, chunk_frames, cfg, stats, device_prep):
    n = len(chunk)
    if device_prep:
        if n < chunk_frames:
            pad = chunk_frames - n
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
            )
        out_q.put((chunk, None, n, ts[:n]))
        return
    t1 = time.perf_counter()
    sig, dino = process_frames(list(chunk), cfg)
    stats.preprocess_s += time.perf_counter() - t1
    if n < chunk_frames:
        pad = chunk_frames - n
        sig = np.concatenate([sig, np.zeros((pad,) + sig.shape[1:], sig.dtype)])
        dino = np.concatenate([dino, np.zeros((pad,) + dino.shape[1:], dino.dtype)])
    out_q.put((sig, dino, n, ts[:n]))


def _decode_chunks(
    video_path: str,
    fps: float,
    chunk_frames: int,
    max_frames: int,
    out_q: queue.Queue,
    cfg: TDCConfig,
    stats: StreamStats,
    device_prep: bool,
):
    """Producer thread: native decode -> (host preprocess | raw uint8) -> queue.

    Seekable containers decode chunk-by-chunk (media.io.decode_video_range),
    so decoding chunk t+1 truly overlaps the device encode of chunk t; GIFs
    and other unsliceable containers fall back to one full decode up front.
    """
    from ..media.io import decode_video, decode_video_range

    try:
        k0 = 0
        while k0 < max_frames:
            k1 = min(k0 + chunk_frames, max_frames)
            t0 = time.perf_counter()
            out = decode_video_range(video_path, k0, k1, fps=fps)
            stats.decode_s += time.perf_counter() - t0
            if out is None:  # unsliceable: one-shot full decode (old path).
                # A mid-stream refusal (e.g. duration only probed per-chunk)
                # must not truncate the stream: decode everything and emit
                # from the first target this loop has not yet delivered.
                t0 = time.perf_counter()
                frames, ts = decode_video(video_path, fps=fps, max_frames=max_frames)
                stats.decode_s += time.perf_counter() - t0
                for start in range(k0, len(frames), chunk_frames):
                    _emit_chunk(
                        out_q, frames[start : start + chunk_frames],
                        ts[start : start + chunk_frames], chunk_frames, cfg,
                        stats, device_prep,
                    )
                break
            chunk, ts = out
            if len(chunk) == 0:
                break
            _emit_chunk(out_q, chunk, ts, chunk_frames, cfg, stats, device_prep)
            if len(chunk) < k1 - k0:  # EOF inside this chunk
                break
            k0 = k1
        out_q.put(None)
    except Exception as e:  # pragma: no cover
        out_q.put(e)


class StreamingEncoder:
    """Chunked encode with decode/compute overlap; compress at end-of-stream."""

    def __init__(
        self,
        cfg: TDCConfig,
        params: Any,
        chunk_frames: int = 32,
        max_frames: int = 1000,
        prefetch: int = 2,
        device_prep: bool = True,
        mesh: Optional[Any] = None,
    ):
        """mesh: optional jax.sharding.Mesh with a "data" axis.  Towers+SVA
        are pure per-frame compute, so sharding each chunk's frame axis over
        the mesh scales single-video ingest nearly linearly with chips (the
        v5e-8 deployment of the BASELINE north star) — a capability upgrade
        over the reference's single-GPU chunk-64 encode loop
        (/root/reference/tdc/cambrian_arch.py:701-714).  Params are
        replicated; GSPMD inserts no collectives in the encode graph.
        Requires chunk_frames % mesh.shape["data"] == 0."""
        self.cfg = cfg
        self.params = params
        self.chunk_frames = chunk_frames
        self.max_frames = max_frames
        self.prefetch = prefetch
        self.device_prep = device_prep
        self.mesh = mesh
        enc = lambda p, s, d: encode_frames(cfg, p, s, d, attn_impl="flash")
        enc_u8 = lambda p, u8: encode_frames(
            cfg, p, *[x.astype(cfg.dtype) for x in device_preprocess(u8, cfg)],
            attn_impl="flash",
        )
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            if chunk_frames % mesh.shape["data"] != 0:
                raise ValueError(
                    f"chunk_frames={chunk_frames} must divide evenly over the "
                    f"mesh data axis ({mesh.shape['data']})"
                )
            fr = NamedSharding(mesh, P("data"))
            # params sharding is inferred (None): towers are replicated by
            # callers, and a TP-sharded LM riding in the same tree must NOT
            # be forced replicated here (it never enters the encode graph)
            self._encode = jax.jit(
                enc, in_shardings=(None, fr, fr), out_shardings=(fr, fr)
            )
            self._encode_u8 = jax.jit(
                enc_u8, in_shardings=(None, fr), out_shardings=(fr, fr)
            )
        else:
            self._encode = jax.jit(enc)
            self._encode_u8 = jax.jit(enc_u8)
        self._compress_cache = {}

    def _compress_fn(self, T: int, max_visual_len: int):
        key = (T, max_visual_len)
        if key not in self._compress_cache:
            self._compress_cache[key] = jax.jit(
                lambda p, ff, df, fm, ti, tm: prepare_visual(
                    self.cfg, p, ff, df, fm, ti, tm, max_visual_len=max_visual_len
                )
            )
        return self._compress_cache[key]

    def encode_stream(
        self, video_path: str, fps: Optional[float] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, np.ndarray, StreamStats]:
        """Returns (frame_feats [T,P,H], dino_feats [T,Nd,Cd], frame_mask [T],
        timestamps, stats) with T padded to a whole number of chunks."""
        stats = StreamStats()
        t_wall = time.perf_counter()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        producer = threading.Thread(
            target=_decode_chunks,
            args=(video_path, fps or self.cfg.video_fps, self.chunk_frames,
                  self.max_frames, q, self.cfg, stats, self.device_prep),
            daemon=True,
        )
        producer.start()

        feats_list, dino_list, counts, ts_list = [], [], [], []
        while True:
            item = q.get()
            if isinstance(item, Exception):
                raise item
            if item is None:
                break
            sig, dino, n, ts = item
            t0 = time.perf_counter()
            if self.device_prep:
                ff, df = self._encode_u8(self.params, jnp.asarray(sig))
            else:
                ff, df = self._encode(
                    self.params,
                    jnp.asarray(sig, self.cfg.dtype),
                    jnp.asarray(dino, self.cfg.dtype),
                )
            # dispatch is async; only block when harvesting
            feats_list.append(ff)
            dino_list.append(df)
            counts.append(n)
            ts_list.append(ts)
            stats.encode_s += time.perf_counter() - t0

        if not feats_list:
            raise IOError(f"no frames decoded from {video_path}")
        frame_feats = jnp.concatenate(feats_list, axis=0)
        dino_feats = jnp.concatenate(dino_list, axis=0)
        jax.block_until_ready(frame_feats)
        T = frame_feats.shape[0]
        mask = np.zeros((T,), bool)
        off = 0
        for n in counts:
            mask[off : off + n] = True
            off += self.chunk_frames
        stats.frames = int(sum(counts))
        stats.wall_s = time.perf_counter() - t_wall
        return frame_feats, dino_feats, jnp.asarray(mask), np.concatenate(ts_list), stats

    def compress(
        self,
        frame_feats: jnp.ndarray,
        dino_feats: jnp.ndarray,
        frame_mask: jnp.ndarray,
        qformer_text_ids: Optional[jnp.ndarray] = None,
        qformer_text_mask: Optional[jnp.ndarray] = None,
        max_visual_len: int = 4096,
    ):
        T = frame_feats.shape[0]
        if qformer_text_ids is None:
            qformer_text_ids = jnp.zeros((8,), jnp.int32)
            qformer_text_mask = jnp.zeros((8,), jnp.bool_)
        fn = self._compress_fn(T, max_visual_len)
        t0 = time.perf_counter()
        visual, n_visual = fn(
            self.params, frame_feats, dino_feats, frame_mask,
            qformer_text_ids, qformer_text_mask,
        )
        jax.block_until_ready(visual)
        return visual, n_visual, time.perf_counter() - t0
