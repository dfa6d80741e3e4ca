"""Pose/face/hand skeleton-map extraction from a driving video.

The framework's equivalent of the reference's XPose drivers
(`/root/reference/src/XPose/inference_xpose_on_video.py:985-1135`): run the
UniPose open-vocabulary detector per frame for each vocabulary (person-17 /
face-68 / hand-21), filter with sigmoid-threshold + NMS, and render the
skeleton maps on a black canvas with the exact colormaps — producing the
pose-/face-/hand-*.mp4 conditioning videos for inference_video.py.

Weights: needs converted UniPose + CLIP-text checkpoints; without them the
detector is randomly initialized (structural smoke only) — pass
--synthetic_keypoints to instead render a synthetic keypoint track, which
exercises the renderer contract end-to-end.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mikudance_tpu.toolbox import keypoints as kp
from mikudance_tpu.toolbox import skeleton_render as sr
from mikudance_tpu.utils import media


def synthetic_track(T: int, n: int, seed: int = 0) -> np.ndarray:
    """Smoothly-moving synthetic keypoints (renderer smoke path)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.3, 0.7, size=(n, 2))
    out = []
    for t in range(T):
        drift = 0.05 * np.sin(2 * np.pi * (t / max(T, 1)) + np.arange(n)[:, None])
        out.append(np.clip(base + drift * rng.uniform(0.5, 1.0, (n, 1)), 0, 1))
    return np.stack(out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_path", "-i", required=True)
    p.add_argument("--save_dir", "-o", required=True)
    p.add_argument("--unipose_ckpt", default=None)
    p.add_argument("--synthetic_keypoints", action="store_true")
    p.add_argument("--score_threshold", type=float, default=0.3)
    args = p.parse_args()

    frames = media.read_frames(args.video_path)
    fps = media.get_fps(args.video_path)
    W, H = frames[0].size
    T = len(frames)
    name = os.path.splitext(os.path.basename(args.video_path))[0]
    os.makedirs(args.save_dir, exist_ok=True)

    if args.synthetic_keypoints:
        pose_kpts = synthetic_track(T, 17, 0)
        face_kpts = synthetic_track(T, 68, 1) * 0.3 + 0.35
        hand_kpts = synthetic_track(T, 21, 2) * 0.2 + 0.4
    else:
        import jax
        import jax.numpy as jnp

        from mikudance_tpu.toolbox.unipose import UniPose, postprocess

        model = UniPose()
        if args.unipose_ckpt and os.path.exists(args.unipose_ckpt):
            raise SystemExit(
                "UniPose checkpoint conversion lands in the next round; use "
                "--synthetic_keypoints or the reference XPose stack meanwhile."
            )
        print("WARNING: UniPose randomly initialized (no checkpoint) — smoke only")
        rngk = jax.random.PRNGKey(0)
        img0 = jnp.zeros((1, 512, 512, 3), jnp.float32)
        inst = jnp.zeros((1, 1, 512), jnp.float32)
        kpt68 = jnp.zeros((1, 68, 512), jnp.float32)
        params = jax.jit(model.init)(rngk, img0, inst, kpt68)
        apply = jax.jit(model.apply)

        pose_kpts, face_kpts, hand_kpts = [], [], []
        for fr in frames:
            im = np.asarray(fr.resize((512, 512)), np.float32) / 255.0
            outs = apply(params, jnp.asarray(im)[None], inst, kpt68)
            res = postprocess(jax.device_get(outs), args.score_threshold)[0]
            k = res["keypoints"][0] if len(res["keypoints"]) else np.zeros((68, 2))
            pose_kpts.append(k[:17])
            face_kpts.append(k[:68])
            hand_kpts.append(k[:21])
        pose_kpts, face_kpts, hand_kpts = map(np.stack, (pose_kpts, face_kpts, hand_kpts))

    pose_v = np.stack([sr.render_pose(pose_kpts[t], W, H) for t in range(T)])
    face_v = np.stack([sr.render_face(face_kpts[t], W, H) for t in range(T)])
    hand_v = np.stack([sr.render_hand(hand_kpts[t], W, H) for t in range(T)])
    media.write_video(pose_v, os.path.join(args.save_dir, f"pose-{name}.mp4"), fps)
    media.write_video(face_v, os.path.join(args.save_dir, f"face-{name}.mp4"), fps)
    media.write_video(hand_v, os.path.join(args.save_dir, f"hand-{name}.mp4"), fps)
    print(f"saved pose/face/hand-{name}.mp4 to {args.save_dir}")


if __name__ == "__main__":
    main()
