"""Video inference CLI — argument-compatible with the reference
(`/root/reference/scripts/inference_video.py:29-45`: --config -W -H --seed
--cfg --steps --fps --video_decoder) reading the same YAML schema
(`configs/inference/inference_video.yaml`).

Usage:
    python -m scripts.inference_video --config configs/inference/inference_video.yaml \
        -W 768 -H 768 --steps 20 --cfg 3.5 --seed 100
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("-W", type=int, default=768)
    p.add_argument("-H", type=int, default=768)
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--cfg", type=float, default=3.5)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--fps", type=int)
    p.add_argument(
        "--video_decoder",
        action="store_true",
        help="Use the temporal VAE decoder (less flicker, slower).",
    )
    p.add_argument("-L", type=int, default=None, help="limit number of frames")
    p.add_argument("--output", default=None)
    return p.parse_args()


def _opt(cfg, key):
    v = cfg.get(key)
    return None if v in (None, "None", "") else v


def main():
    args = parse_args()
    with open(args.config) as f:
        cfg = yaml.safe_load(f)

    import jax.numpy as jnp

    from mikudance_tpu.core import loaders
    from mikudance_tpu.core.configs import ContextConfig, PipelineConfig
    from mikudance_tpu.pipelines import scene_motion as sm
    from mikudance_tpu.pipelines.video import ModelBundle, VideoPipeline
    from mikudance_tpu.utils import media

    width, height = args.W, args.H
    assert width % 8 == 0 and height % 8 == 0, "W/H must be divisible by 8 (f8 VAE)"
    h, w = height // 8, width // 8

    dtype = jnp.bfloat16 if cfg.get("weight_dtype", "fp16") in ("fp16", "bf16") else jnp.float32

    # ------------------------------------------------------------- conditions
    tgt_pose = _opt(cfg, "tgt_pose_path")
    if tgt_pose is None:
        raise ValueError("Target pose is required!")
    pose_pils = media.read_frames(tgt_pose)
    src_fps = media.get_fps(tgt_pose)
    if args.L:
        pose_pils = pose_pils[: args.L]
    T = len(pose_pils)
    print(f"Total frames: {T}")

    # absent face/hand streams stay None: the pipeline encodes a single black
    # frame and broadcasts its latent (== the reference's black-video fallback)
    face_path, hand_path = _opt(cfg, "tgt_face_path"), _opt(cfg, "tgt_hand_path")
    face_pils = media.read_frames(face_path)[:T] if face_path else None
    hand_pils = media.read_frames(hand_path)[:T] if hand_path else None

    w2c_path, c2w_path = _opt(cfg, "tgt_w2c_path"), _opt(cfg, "tgt_c2w_path")
    if w2c_path and c2w_path:
        w2c = np.load(w2c_path)[:T]
        c2w = np.load(c2w_path)[:T]
    else:
        w2c = np.tile(np.eye(4)[None], (T, 1, 1))
        c2w = np.tile(np.eye(4)[None], (T, 1, 1))

    depth_path = _opt(cfg, "ref_depth_path")
    depth = np.load(depth_path) if depth_path else np.zeros((1, height, width), np.float32)
    depth = media.resize_depth(depth, h, w)
    motion = sm.scene_motion_flow_np(w2c, c2w, depth)  # (T, h, w, 2)

    ref_pil = media.load_image(cfg["ref_image_path"])
    skel_pil = media.load_image(cfg["ref_skel_path"])
    # uint8 end-to-end: frames normalize on device (4x less H2D traffic)
    ref = media.to_u8_frame(ref_pil, height, width)
    skel = media.to_u8_frame(skel_pil, height, width)
    pose = media.frames_to_u8(pose_pils, height, width)
    face = media.frames_to_u8(face_pils, height, width) if face_pils else None
    hand = media.frames_to_u8(hand_pils, height, width) if hand_pils else None

    # ------------------------------------------------------------- models
    ref_path = _opt(cfg, "reference_unet_path")
    den_path = _opt(cfg, "denoising_unet_path")
    mm_path = _opt(cfg, "motion_module_path")
    sd_dir = _opt(cfg, "pretrained_base_model_path")
    sd_unet = os.path.join(sd_dir, "unet") if sd_dir else None
    sd_unet_file = loaders._find_weights(sd_unet) if sd_unet and os.path.isdir(sd_unet) else None

    if not (ref_path and os.path.exists(ref_path)):
        print("WARNING: reference_unet weights not found -> random init (smoke mode)")

    # Optional hyperparameter file — the reference's `inference_config:`
    # indirection (mikudance_config.yaml: motion-module kwargs + scheduler
    # kwargs + sampler); absent keys keep the dataclass defaults, which ARE
    # the released-checkpoint settings.
    motion_cfg, sched_cfg = None, None
    icfg_path = _opt(cfg, "inference_config")
    if icfg_path and os.path.exists(icfg_path):
        from mikudance_tpu.core.configs import MotionModuleConfig, SchedulerConfig

        with open(icfg_path) as f:
            icfg = yaml.safe_load(f) or {}
        ua = icfg.get("unet_additional_kwargs", {})
        # variants the released checkpoints never use (and this rebuild does
        # not implement) fail loudly instead of silently diverging:
        if ua.get("unet_use_cross_frame_attention") or ua.get("unet_use_temporal_attention"):
            raise NotImplementedError(
                "cross-frame / temporal attention UNet variants are not built "
                "(off in every reference config)"
            )
        if ua.get("motion_module_type", "Vanilla") != "Vanilla":
            raise NotImplementedError("only the Vanilla motion module exists")
        if not ua.get("use_inflated_groupnorm", True):
            raise NotImplementedError(
                "per-frame (non-inflated) GroupNorm is the only lowering here"
            )
        mk = ua.get("motion_module_kwargs", {})
        motion_cfg = MotionModuleConfig(
            enabled=bool(ua.get("use_motion_module", True)),
            num_attention_heads=int(mk.get("num_attention_heads", 8)),
            num_transformer_blocks=int(mk.get("num_transformer_block", 1)),
            attention_layers_per_block=len(
                mk.get("attention_block_types", ["Temporal_Self", "Temporal_Self"])
            ),
            temporal_position_encoding=bool(
                mk.get("temporal_position_encoding", True)
            ),
            temporal_position_encoding_max_len=int(
                mk.get("temporal_position_encoding_max_len", 32)
            ),
            resolutions=tuple(ua.get("motion_module_resolutions", (1, 2, 4, 8))),
            mid_block=bool(ua.get("motion_module_mid_block", True)),
            decoder_only=bool(ua.get("motion_module_decoder_only", False)),
        )
        nk = icfg.get("noise_scheduler_kwargs", {})
        d = SchedulerConfig()
        sched_cfg = SchedulerConfig(
            beta_start=float(nk.get("beta_start", d.beta_start)),
            beta_end=float(nk.get("beta_end", d.beta_end)),
            beta_schedule=nk.get("beta_schedule", d.beta_schedule),
            prediction_type=nk.get("prediction_type", d.prediction_type),
            rescale_betas_zero_snr=bool(
                nk.get("rescale_betas_zero_snr", d.rescale_betas_zero_snr)
            ),
            timestep_spacing=nk.get("timestep_spacing", d.timestep_spacing),
        )
        sampler = icfg.get("sampler", "DDIM")
        if sampler != "DDIM":
            raise ValueError(f"only the DDIM sampler is supported, got {sampler!r}")

    guide, gp = loaders.load_guidance_params(ref_path, use_man=True, dtype=dtype, latent_hw=h)
    den, dp = loaders.load_denoising_params(
        den_path, mm_path, sd_unet_file, use_motion=True, dtype=dtype, latent_hw=h,
        motion_config=motion_cfg,
    )
    enc, ep, dec, dcp = loaders.load_vae_params(_opt(cfg, "pretrained_vae_path"), dtype=dtype, hw=height)
    clip, cp = loaders.load_clip_params(_opt(cfg, "image_encoder_path"), dtype=dtype)
    if args.video_decoder:
        from mikudance_tpu.models.vae_temporal import TemporalDecoder
        from mikudance_tpu.core.loaders import load_temporal_decoder_params

        dec, dcp = load_temporal_decoder_params(
            _opt(cfg, "pretrained_temporal_vae_path"), dtype=dtype, hw=height
        )

    bundle = ModelBundle(guide, gp, den, dp, enc, ep, dec, dcp, clip, cp)

    # ------------------------------------------------------------- clip embed
    import jax

    clip_in = media.to_clip_input(ref_pil)
    clip_ctx = np.asarray(
        jax.jit(clip.apply)(cp, jnp.asarray(clip_in, dtype)).astype(jnp.float32)
    )

    # ------------------------------------------------------------- noise
    # torch CPU RNG for bit-parity with the reference's randn_tensor
    noise_ref = media.torch_seed_noise(args.seed, (1, 4, T, h, w), dtype_half=True)
    noise = np.moveaxis(noise_ref[0], 0, -1)  # (T, h, w, 4)

    pcfg = PipelineConfig(
        width=width, height=height, num_inference_steps=args.steps,
        guidance_scale=args.cfg, context=ContextConfig(frames=30, overlap=8),
        **({"scheduler": sched_cfg} if sched_cfg else {}),
    )
    # SPMD inference: on a multi-chip slice (e.g. v5e-8) the CFG/window batch
    # and the frames within each window shard over a ('win','frame') mesh;
    # single chip runs the plain path (the reference is single-GPU only,
    # `inference_video.py:70`).
    devices = jax.devices()
    pipe = VideoPipeline(bundle, pcfg, devices=devices if len(devices) > 1 else None)
    video = np.asarray(
        pipe(ref, skel, pose, face, hand, motion, clip_ctx, noise, to_host=True)
    )
    video_f = video.astype(np.float32) / 255.0

    # ------------------------------------------------------------- save
    date_str = datetime.now().strftime("%Y%m%d")
    time_str = datetime.now().strftime("%H%M%S")
    out = args.output
    if out is None:
        skel_name = Path(tgt_pose).stem
        ref_name = Path(cfg["ref_image_path"]).stem
        out_dir = Path(f"output/{date_str}/{time_str}--seed_{args.seed}-{width}x{height}")
        out = str(out_dir / f"{skel_name}_{ref_name}_{height}x{width}_{int(args.cfg)}_{time_str}.mp4")

    # frames travel uint8 end-to-end; the grid writer wants float [0, 1]
    ref_row = np.tile((ref.astype(np.float32) / 255.0)[None], (T, 1, 1, 1))
    media.save_video_grid(
        [ref_row, pose.astype(np.float32) / 255.0, video_f],
        out, fps=args.fps or src_fps,
    )
    print(f"saved: {out}")


if __name__ == "__main__":
    main()
