"""Depth-map tool: character image -> depm-*.npy + depi-* preview.

Rebuilds `/root/reference/tools/depth_from_image.py`: DPT-hybrid-MiDaS depth,
bicubic-resized to the image size, min-max normalized to [0,1], saved as npy
(the reference-depth input of the pipeline) plus a grayscale preview image.

Host-side preprocessing tool (CPU, torch/transformers) — not on the TPU
compute path; a Flax DPT port is planned. Requires the Intel/dpt-hybrid-midas
weights (see tools/download_weights.py).

Usage: python tools/depth_from_image.py --image_path char.jpg --save_dir out/
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image


def main(args):
    import torch
    from transformers import DPTForDepthEstimation, DPTImageProcessor

    model_id = args.model or "Intel/dpt-hybrid-midas"
    processor = DPTImageProcessor.from_pretrained(model_id)
    model = DPTForDepthEstimation.from_pretrained(model_id)
    model.eval()

    frame = Image.open(args.image_path).convert("RGB")
    name = os.path.splitext(os.path.basename(args.image_path))[0]
    H, W = frame.size[1], frame.size[0]

    px = processor(images=frame, return_tensors="pt").pixel_values
    with torch.no_grad():
        depth = model(px).predicted_depth  # (1, h', w')
    depth = torch.nn.functional.interpolate(
        depth.unsqueeze(1), size=(H, W), mode="bicubic", align_corners=False
    )
    dmin = depth.amin()
    dmax = depth.amax()
    depth = (depth - dmin) / (dmax - dmin)
    depth_np = depth[0].numpy()  # (1, H, W), [0,1]

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
    p.add_argument("--model", default=None)
    main(p.parse_args())
