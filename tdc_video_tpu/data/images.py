"""Image preprocessing: pad-to-square with mean fill + per-tower resize and
normalization.

Re-implements process_images / expand2square (tdc/mm_datautils.py:264-330)
for the two towers.  Tower constants pin the HF processor configs the
reference loads:

* SigLIP so400m-384: resize 384, mean/std 0.5 (HF SiglipImageProcessor)
* DINOv2-giant @378: resize 378, ImageNet mean/std (dino_encoder.py:41-46)

Output layout is [H, W, 3] float32 channels-last (TPU-friendly; torch uses
CHW), already normalized.  Video paths feed uint8 numpy frames; the PIL
bicubic resize matches the reference's PIL resize + HF processor chain.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from ..config import TDCConfig


@dataclasses.dataclass(frozen=True)
class TowerPreprocess:
    size: int
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]


SIGLIP_PREPROCESS = TowerPreprocess(384, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
DINOV2_PREPROCESS = TowerPreprocess(
    378, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
)


def tower_preprocess_list(cfg: TDCConfig) -> List[TowerPreprocess]:
    return [
        dataclasses.replace(SIGLIP_PREPROCESS, size=cfg.siglip.image_size),
        dataclasses.replace(DINOV2_PREPROCESS, size=cfg.dino.image_size),
    ]


def expand2square(img: np.ndarray, fill: Tuple[int, int, int]) -> np.ndarray:
    """uint8 [H, W, 3] -> centered square canvas filled with the tower mean
    (reference expand2square, mm_datautils.py:264-283)."""
    h, w = img.shape[:2]
    if h == w:
        return img
    side = max(h, w)
    canvas = np.empty((side, side, 3), img.dtype)
    canvas[:] = np.asarray(fill, img.dtype)
    top = (side - h) // 2
    left = (side - w) // 2
    canvas[top : top + h, left : left + w] = img
    return canvas


def _resize_bicubic(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    if img.shape[0] == size and img.shape[1] == size:
        return img
    return np.asarray(Image.fromarray(img).resize((size, size), Image.BICUBIC))


def preprocess_frame(img: np.ndarray, tp: TowerPreprocess) -> np.ndarray:
    """uint8 [H, W, 3] -> normalized float32 [size, size, 3]."""
    fill = tuple(int(m * 255) for m in tp.mean)
    sq = expand2square(img, fill)
    sq = _resize_bicubic(sq, tp.size)
    x = sq.astype(np.float32) / 255.0
    return (x - np.asarray(tp.mean, np.float32)) / np.asarray(tp.std, np.float32)


def process_frames(
    frames: Sequence[np.ndarray], cfg: TDCConfig
) -> Tuple[np.ndarray, np.ndarray]:
    """uint8 frames -> (siglip_px [T, 384, 384, 3], dino_px [T, 378, 378, 3]),
    the per-tower batch the model consumes (reference process_images returns a
    list-of-tower-batches, mm_datautils.py:286-314)."""
    sig_tp, dino_tp = tower_preprocess_list(cfg)
    sig = np.stack([preprocess_frame(f, sig_tp) for f in frames])
    dino = np.stack([preprocess_frame(f, dino_tp) for f in frames])
    return sig, dino


def pad_frames(
    sig: np.ndarray, dino: np.ndarray, max_frames: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Right-pad the frame axis to a static bucket; returns (sig, dino, mask)."""
    T = sig.shape[0]
    if T > max_frames:
        sig, dino, T = sig[:max_frames], dino[:max_frames], max_frames
    mask = np.zeros((max_frames,), bool)
    mask[:T] = True
    out_s = np.zeros((max_frames,) + sig.shape[1:], sig.dtype)
    out_d = np.zeros((max_frames,) + dino.shape[1:], dino.dtype)
    out_s[:T] = sig
    out_d[:T] = dino
    return out_s, out_d, mask


def frame_bucket(n: int, buckets: Sequence[int] = (8, 16, 32, 64, 128, 224, 448, 1000)) -> int:
    """Static-shape bucketing: compile once per bucket, not per video length."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def device_preprocess(frames_u8, cfg: TDCConfig):
    """On-device per-tower preprocessing: uint8 frames [T, h, w, 3] ->
    (siglip_px, dino_px), normalized.

    jnp equivalent of preprocess_frame (expand2square with mean fill +
    bicubic resize + normalize) so the host only decodes and ships raw bytes;
    the resize rides the TPU next to the towers (the host PIL path costs
    ~180 ms/frame on a small host, the device path is ~free).  jax.image
    bicubic with antialiasing stands in for PIL BICUBIC.
    """
    import jax
    import jax.numpy as jnp

    T, h, w, _ = frames_u8.shape
    side = max(h, w)
    outs = []
    for tp in tower_preprocess_list(cfg):
        mean255 = jnp.asarray([int(m * 255) for m in tp.mean], jnp.float32)
        canvas = jnp.broadcast_to(mean255, (T, side, side, 3))
        top, left = (side - h) // 2, (side - w) // 2
        canvas = jax.lax.dynamic_update_slice(
            canvas, frames_u8.astype(jnp.float32), (0, top, left, 0)
        )
        x = jax.image.resize(
            canvas, (T, tp.size, tp.size, 3), method="cubic", antialias=True
        )
        x = x / 255.0
        x = (x - jnp.asarray(tp.mean)) / jnp.asarray(tp.std)
        outs.append(x)
    return outs[0], outs[1]
