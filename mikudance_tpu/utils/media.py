"""Media IO and image preprocessing.

Mirrors the reference's util surface (`/root/reference/src/utils/util.py`:
``read_frames:106``, ``get_fps:123``, ``save_videos_grid:86``,
``seed_everything:16``) using imageio/PIL (the reference uses PyAV +
torchvision; not available here and not load-bearing).

Preprocessing parity:
- VAE streams use lanczos resize (diffusers ``VaeImageProcessor`` default);
  the reference normalizes the ref image to [-1, 1] and leaves skeleton /
  pose / face / hand in [0, 1] (``do_normalize=False`` cond processor,
  `pipeline_mikudance.py:71-79`).
- CLIP input: bicubic resize to 224 + CLIP mean/std normalization
  (`pipeline_mikudance.py:405-408`).
"""

from __future__ import annotations

import os
import random
from typing import List, Optional

import numpy as np
from PIL import Image

from ..models.clip_vision import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


def seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed % (2**32))


def read_frames(path: str) -> List[Image.Image]:
    """All frames of a video file as PIL images (cv2 backend; the reference
    uses PyAV, `src/utils/util.py:106`)."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)))
    cap.release()
    return frames


def get_fps(path: str) -> float:
    import cv2

    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    cap.release()
    return float(fps)


def write_video(frames_u8: np.ndarray, path: str, fps: float = 30.0) -> None:
    """(T, H, W, 3) uint8 RGB -> mp4/gif."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if os.path.splitext(path)[1].lower() == ".gif":
        import imageio.v2 as iio

        iio.mimsave(path, list(frames_u8), fps=fps)
        return
    import cv2

    T, H, W, _ = frames_u8.shape
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
    for f in frames_u8:
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()


def save_video_grid(rows: List[np.ndarray], path: str, fps: float = 30.0) -> None:
    """Stack (T, H, W, 3) float [0,1] arrays vertically and write a video.

    Equivalent to the reference's 3-row comparison mp4
    (`scripts/inference_video.py:228-234`).
    """
    T = rows[0].shape[0]
    assert all(r.shape[0] == T for r in rows)
    grid = np.concatenate(rows, axis=1)  # stack vertically
    write_video((np.clip(grid, 0, 1) * 255).astype(np.uint8), path, fps)


# ------------------------------------------------------------- preprocessing

def load_image(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


def to_vae_input(
    img: Image.Image, height: int, width: int, normalize: bool
) -> np.ndarray:
    """(H, W, 3) float32; [-1,1] when normalize (ref image) else [0,1]."""
    img = img.resize((width, height), Image.LANCZOS)
    x = np.asarray(img, dtype=np.float32) / 255.0
    if normalize:
        x = x * 2.0 - 1.0
    return x


def to_u8_frame(img: Image.Image, height: int, width: int) -> np.ndarray:
    """(H, W, 3) uint8, resized only. The pipeline normalizes ON DEVICE
    (pipelines/video.py::to_unit_float) so frames cross the slow host->device
    link at 1 byte per pixel instead of 4."""
    return np.asarray(img.resize((width, height), Image.LANCZOS), np.uint8)


def frames_to_u8(frames: List[Image.Image], height: int, width: int) -> np.ndarray:
    return np.stack([to_u8_frame(f, height, width) for f in frames])


def frames_to_vae_input(
    frames: List[Image.Image], height: int, width: int, normalize: bool = False
) -> np.ndarray:
    return np.stack([to_vae_input(f, height, width, normalize) for f in frames])


def to_clip_input(img: Image.Image) -> np.ndarray:
    """(1, 224, 224, 3) CLIP-normalized float32."""
    img = img.resize((224, 224), Image.BICUBIC)
    x = np.asarray(img, dtype=np.float32) / 255.0
    x = (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    return x[None]


def black_frames(n: int, height: int, width: int) -> List[Image.Image]:
    return [Image.new("RGB", (width, height), (0, 0, 0)) for _ in range(n)]


def resize_depth(depth: np.ndarray, h: int, w: int) -> np.ndarray:
    """Depth map -> (h, w), bilinear (the reference uses skimage.resize,
    `scripts/inference_video.py:184`)."""
    d = np.asarray(depth, dtype=np.float32)
    if d.ndim == 3:
        d = d[0]
    img = Image.fromarray(d)
    return np.asarray(img.resize((w, h), Image.BILINEAR), dtype=np.float32)


def torch_seed_noise(seed: int, shape, dtype_half: bool = True) -> np.ndarray:
    """Initial latent noise drawn with torch's CPU RNG for bit-parity with the
    reference (`randn_tensor` with a manual-seed CPU generator, fp16 latents:
    `pipeline_mikudance.py:440-450`, `inference_video.py:105`). torch is used
    ONLY for RNG parity on host — never in the compute path."""
    import torch

    g = torch.manual_seed(seed)
    dt = torch.float16 if dtype_half else torch.float32
    return torch.randn(shape, generator=g, dtype=dt).float().numpy()
