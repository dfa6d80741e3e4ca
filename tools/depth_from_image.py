"""Depth-map tool: character image -> depm-*.npy + depi-* preview.

Rebuilds `/root/reference/tools/depth_from_image.py`: DPT-hybrid-MiDaS depth,
bicubic-resized to the image size, min-max normalized to [0,1], saved as npy
(the reference-depth input of the pipeline) plus a grayscale preview image.

Default backend is the package's own Flax DPT (toolbox/dpt.py, runs on the
TPU; checkpoint converted from the Intel/dpt-hybrid-midas torch weights by
core.convert.convert_dpt, parity-tested in tests/test_dpt_parity.py).
`--backend torch` keeps the transformers path as an oracle fallback.

Usage: python tools/depth_from_image.py --image_path char.jpg --save_dir out/
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_WEIGHTS = "./pretrained_weights/dpt-hybrid-midas/pytorch_model.bin"


def depth_flax(frame: Image.Image, weights_path: str) -> np.ndarray:
    """(H, W) relative depth at the model's 384^2 grid, fp32."""
    import jax
    import torch

    from mikudance_tpu.core.convert import convert_dpt
    from mikudance_tpu.toolbox.dpt import DPTHybridDepth, preprocess

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    params = convert_dpt(sd)
    model = DPTHybridDepth()
    x = preprocess(np.asarray(frame))
    depth = jax.jit(lambda p, px: model.apply({"params": p}, px))(params, x)
    return np.asarray(depth[0], dtype=np.float32)


def depth_torch(frame: Image.Image, model_id: str) -> np.ndarray:
    import torch
    from transformers import DPTForDepthEstimation, DPTImageProcessor

    processor = DPTImageProcessor.from_pretrained(model_id)
    model = DPTForDepthEstimation.from_pretrained(model_id).eval()
    px = processor(images=frame, return_tensors="pt").pixel_values
    with torch.no_grad():
        return model(px).predicted_depth[0].numpy()


def resize_bicubic(depth: np.ndarray, H: int, W: int) -> np.ndarray:
    """Upsample the raw depth grid to the image size (the reference uses
    torch bicubic, `depth_from_image.py:21-26`; PIL bicubic matches to within
    resampling-kernel tolerance, and the output is min-max normalized)."""
    lo, hi = float(depth.min()), float(depth.max())
    scaled = (depth - lo) / max(hi - lo, 1e-12)
    img = Image.fromarray((scaled * 65535.0).astype(np.float32), mode="F")
    out = np.asarray(img.resize((W, H), Image.BICUBIC), dtype=np.float32)
    return out / 65535.0 * (hi - lo) + lo


def main(args):
    frame = Image.open(args.image_path).convert("RGB")
    name = os.path.splitext(os.path.basename(args.image_path))[0]
    W, H = frame.size

    if args.backend == "flax":
        weights = args.model or DEFAULT_WEIGHTS
        if not os.path.exists(weights):
            raise SystemExit(
                f"weights not found at {weights}; run tools/download_weights.py "
                "--only dpt, or use --backend torch")
        depth = depth_flax(frame, weights)
    else:
        depth = depth_torch(frame, args.model or "Intel/dpt-hybrid-midas")

    depth = resize_bicubic(depth, H, W)
    dmin, dmax = float(depth.min()), float(depth.max())
    depth = (depth - dmin) / max(dmax - dmin, 1e-12)
    depth_np = depth[None]  # (1, H, W), [0,1]

    os.makedirs(args.save_dir, exist_ok=True)
    np.save(os.path.join(args.save_dir, f"depm-{name}.npy"), depth_np)
    preview = (np.repeat(depth_np.transpose(1, 2, 0), 3, axis=-1) * 255).clip(0, 255)
    Image.fromarray(preview.astype(np.uint8)).save(
        os.path.join(args.save_dir, f"depi-{name}.png")
    )
    print(f"saved depm-{name}.npy and depi-{name}.png to {args.save_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--image_path", required=True)
    p.add_argument("--save_dir", default="./demo_samples/chars/")
    p.add_argument("--model", default=None,
                   help="flax: weights .bin path; torch: HF model id")
    p.add_argument("--backend", choices=("flax", "torch"), default="flax")
    main(p.parse_args())
