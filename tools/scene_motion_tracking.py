"""Camera matrices + depth -> scene-motion flow npy (latent resolution).

Thin CLI over mikudance_tpu.pipelines.scene_motion (the in-framework rebuild
of `/root/reference/tools/scene_motion_tracking.py`).

Usage:
    python tools/scene_motion_tracking.py --w2c w2c.npy --c2w c2w.npy \
        --depth depm.npy -W 768 -H 768 -o scene_motion.npy
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mikudance_tpu.pipelines.scene_motion import scene_motion_flow_np
from mikudance_tpu.utils.media import resize_depth


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--w2c", required=True)
    p.add_argument("--c2w", required=True)
    p.add_argument("--depth", default=None)
    p.add_argument("-W", type=int, default=768)
    p.add_argument("-H", type=int, default=768)
    p.add_argument("-o", "--output", required=True)
    args = p.parse_args()

    h, w = args.H // 8, args.W // 8
    w2c, c2w = np.load(args.w2c), np.load(args.c2w)
    depth = (
        resize_depth(np.load(args.depth), h, w) if args.depth else np.zeros((h, w))
    )
    flow = scene_motion_flow_np(w2c, c2w, depth)  # (T, h, w, 2) NHWC
    np.save(args.output, flow)
    print(f"saved {args.output}: {flow.shape}")


if __name__ == "__main__":
    main()
