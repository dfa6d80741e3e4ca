"""Stage-2 trainer: motion modules + MAN blocks only, on video clips.
TPU-native rebuild of `/root/reference/scripts/train_stage2.py` (config
schema mirrors `configs/train/train_stage2.yaml`): loads stage-1 weights +
the AnimateDiff motion-module ckpt, freezes everything except
``motion_modules`` in the denoising UNet and ``man_blocks`` in the reference
UNet (`:379-394`), trains on `n_sample_frames`-frame clips with per-sample
scene motion, and exports a motion-module-only deployable dict (`:898-926`).

Usage:
    python -m scripts.train_stage2 --config configs/train/train_stage2.yaml
    python -m scripts.train_stage2 --config configs/train/train_stage2.yaml --synthetic 8
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import yaml


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--max_steps", type=int, default=None)
    return p.parse_args()


def synthetic_batches(bs, T, size, steps):
    rng = np.random.default_rng(0)
    h = size // 8
    for _ in range(steps):
        yield {
            "tgt_vdo": rng.uniform(-1, 1, (bs, T, size, size, 3)).astype(np.float32),
            "tgt_pose": rng.uniform(0, 1, (bs, T, size, size, 3)).astype(np.float32),
            "tgt_face": rng.uniform(0, 1, (bs, T, size, size, 3)).astype(np.float32),
            "tgt_hand": rng.uniform(0, 1, (bs, T, size, size, 3)).astype(np.float32),
            "scene_motion": rng.normal(0, 0.1, (bs, T, h, h, 2)).astype(np.float32),
            "ref_img": rng.uniform(-1, 1, (bs, size, size, 3)).astype(np.float32),
            "ref_skel_img": rng.uniform(0, 1, (bs, size, size, 3)).astype(np.float32),
            "clip_img": rng.normal(0, 1, (bs, 224, 224, 3)).astype(np.float32),
        }


def main():
    args = parse_args()
    with open(args.config) as f:
        cfg = yaml.safe_load(f)

    # multi-host pods: see scripts/train_stage1.py — same-seed determinism
    # makes every host materialize the same global batch
    if int(os.environ.get("MIKUDANCE_MULTIHOST", "0")):
        jax.distributed.initialize()

    from mikudance_tpu.core import loaders
    from mikudance_tpu.diffusion.ddim import DDIMSchedule
    from mikudance_tpu.train import checkpoint as ckpt_lib
    from mikudance_tpu.train.runner import make_encoder_fns, train_loop
    from mikudance_tpu.train.steps import TrainConfig

    data_cfg = cfg.get("data", {})
    solver = cfg.get("solver", {})
    size = int(data_cfg.get("train_width", 576))
    bs = int(data_cfg.get("train_bs", 1))
    T = int(data_cfg.get("n_sample_frames", 20))
    h = size // 8
    dtype = jnp.bfloat16 if solver.get("mixed_precision", "fp16") in ("fp16", "bf16") else jnp.float32

    unet_cfg = None
    if cfg.get("unet_overrides"):
        from mikudance_tpu.core.configs import UNetConfig

        ov = cfg["unet_overrides"]
        unet_cfg = UNetConfig(
            block_out_channels=tuple(ov.get("block_out_channels", (320, 640, 1280, 1280))),
            attention_heads=int(ov.get("attention_heads", 8)),
        )

    # stage 2: MIX guidance UNet (MAN on) from stage-1 ckpt; 3D denoising UNet
    # with motion modules merged from mm_path (`train_stage2.py:352-377`).
    # remat defaults ON here (unlike the reference's 40 GB GPUs,
    # `train_stage2.py:425-427` gates it off): the v5e backward at 576^2
    # does not fit 16 GB without it (bench_train.py's memory_analysis).
    remat = bool(solver.get("gradient_checkpointing", True))
    # stage-1 weights: explicit paths, or the reference's dir+step scheme
    # (`train_stage2.py:361-377`: {dir}/{denoising,reference}_unet-{step}.pth)
    ref_path = cfg.get("stage1_reference_unet")
    den_path = cfg.get("stage1_denoising_unet")
    if cfg.get("stage1_ckpt_dir"):  # each path derived independently:
        step1 = cfg.get("stage1_ckpt_step", 120000)
        ref_path = ref_path or os.path.join(
            cfg["stage1_ckpt_dir"], f"reference_unet-{step1}.pth")
        den_path = den_path or os.path.join(
            cfg["stage1_ckpt_dir"], f"denoising_unet-{step1}.pth")
    guide, gp = loaders.load_guidance_params(
        ref_path, use_man=True, dtype=dtype, latent_hw=h,
        unet_config=unet_cfg, remat=remat,
    )
    den, dp = loaders.load_denoising_params(
        den_path, cfg.get("mm_path"),
        use_motion=True, dtype=dtype, latent_hw=h, unet_config=unet_cfg, remat=remat,
    )
    vae_enc, vep, vae_dec, vdp = loaders.load_vae_params(cfg.get("vae_model_path"), dtype=dtype, hw=size)
    clip, cp = loaders.load_clip_params(cfg.get("image_encoder_path"), dtype=dtype)
    enc = make_encoder_fns(vae_enc, vep, clip, cp)

    sched_kwargs = cfg.get("noise_scheduler_kwargs", {})
    zero_snr = bool(cfg.get("enable_zero_snr", True))
    schedule = DDIMSchedule.create(
        num_train_timesteps=int(sched_kwargs.get("num_train_timesteps", 1000)),
        beta_start=float(sched_kwargs.get("beta_start", 0.00085)),
        beta_end=float(sched_kwargs.get("beta_end", 0.012)),
        beta_schedule=sched_kwargs.get("beta_schedule", "scaled_linear"),
        prediction_type="v_prediction" if zero_snr else "epsilon",
        rescale_betas_zero_snr=zero_snr,
    )

    accum = int(solver.get("gradient_accumulation_steps", 1))
    lr = float(solver.get("learning_rate", 1e-5))
    if solver.get("scale_lr"):
        # the host batch is already global (sharded over the mesh): no
        # device-count factor, unlike the reference's per-process loaders
        lr *= accum * bs
    tcfg = TrainConfig(
        learning_rate=lr,
        adam_b1=float(solver.get("adam_beta1", 0.9)),
        adam_b2=float(solver.get("adam_beta2", 0.999)),
        adam_eps=float(solver.get("adam_epsilon", 1e-8)),
        weight_decay=float(solver.get("adam_weight_decay", 1e-2)),
        max_grad_norm=float(solver.get("max_grad_norm", 1.0)),
        uncond_ratio=float(cfg.get("uncond_ratio", 0.1)),
        noise_offset=float(cfg.get("noise_offset", 0.05)),
        snr_gamma=float(cfg.get("snr_gamma", 5.0)),
        prediction_type="v_prediction" if zero_snr else "epsilon",
        trainable_substrings=("motion", "man_"),  # `train_stage2.py:379-394`
        lr_scheduler=solver.get("lr_scheduler", "constant"),
        lr_warmup_steps=int(solver.get("lr_warmup_steps", 0)),
        max_train_steps=int(solver.get("max_train_steps", 0)),
        gradient_accumulation_steps=accum,
    )

    enc_rng = {"key": jax.random.PRNGKey(cfg.get("seed", 186))}

    def prepare_batch(batch, host_rng: random.Random):
        enc_rng["key"], sub = jax.random.split(enc_rng["key"])
        B = batch["tgt_vdo"].shape[0]

        def flat(x):  # (B, T, H, W, C) -> (B*T, H, W, C)
            a = jnp.asarray(x, dtype)
            return a.reshape((-1,) + a.shape[2:])

        lat = enc.vae_encode_sample(sub, flat(batch["tgt_vdo"]))
        pose_l = enc.vae_encode_mean(flat(batch["tgt_pose"]))
        face_l = enc.vae_encode_mean(flat(batch["tgt_face"]))
        hand_l = enc.vae_encode_mean(flat(batch["tgt_hand"]))
        refskel = jnp.concatenate(
            [jnp.asarray(batch["ref_img"], dtype), jnp.asarray(batch["ref_skel_img"], dtype)],
            axis=0,
        )
        rs = enc.vae_encode_mean(refskel)
        ref_l, skel_l = rs[:B], rs[B:]

        def unflat(x):
            return x.reshape((B, T) + x.shape[1:])

        ref_rep = jnp.repeat(ref_l[:, None], T, axis=1)
        skel_rep = jnp.repeat(skel_l[:, None], T, axis=1)
        cond20 = jnp.concatenate(
            [ref_rep, skel_rep, unflat(pose_l), unflat(face_l), unflat(hand_l)], axis=-1
        )
        ctx = enc.clip_encode(jnp.asarray(batch["clip_img"], dtype))
        uncond = float(host_rng.random() < tcfg.uncond_ratio)
        return {
            "latents": unflat(lat).astype(jnp.float32),
            "cond20": cond20.astype(jnp.float32),
            "motion": jnp.asarray(batch["scene_motion"], jnp.float32),
            "clip_ctx": ctx.astype(jnp.float32),
            "uncond": jnp.full((B,), uncond, jnp.float32),
        }

    exp_name = cfg.get("exp_name", "train_stage2_mikudance")
    out_dir = os.path.join(cfg.get("output_dir", "./train_output"), exp_name)
    max_steps = args.max_steps or int(solver.get("max_train_steps", 60000))

    val_batch = {"holder": None}  # filled by the first batch; used by validation_fn

    def _capture(it):
        for bt in it:
            if val_batch["holder"] is None:
                val_batch["holder"] = bt
            yield bt

    if args.synthetic:
        batches = _capture(synthetic_batches(bs, T, size, max_steps))
    else:
        import json

        from mikudance_tpu.data.datasets import AnimeVideoDataset, PrefetchLoader, VideoSample

        with open(cfg["data_manifest"]) as f:
            manifest = json.load(f)
        ds = AnimeVideoDataset(
            [VideoSample(**s) for s in manifest],
            img_size=(size, size),
            n_sample_frames=T,
            sample_rate=int(data_cfg.get("sample_rate", 3)),
            drop_ratio=float(data_cfg.get("drop_ratio", 0.1)),
            drop_vdo_ratio=float(data_cfg.get("drop_vdo_ratio", 0.1)),
        )
        loader = PrefetchLoader(ds, bs)
        # per-epoch factory: train_loop re-iterates until max_steps (the
        # reference's epoch loop, `train_stage2.py:560-566`).
        batches = lambda: _capture(iter(loader))

    def validation_fn(step, state):
        """Golden-fixture validation: run the full video pipeline with the
        CURRENT weights and save a GIF (the reference's log_validation,
        `train_stage2.py:142-279,797-822`)."""
        if val_batch["holder"] is None:
            return
        import numpy as np

        from mikudance_tpu.core.configs import ContextConfig, PipelineConfig
        from mikudance_tpu.pipelines.video import ModelBundle, VideoPipeline
        from mikudance_tpu.utils.media import save_video_grid

        b = val_batch["holder"]
        bundle = ModelBundle(
            guide, {"params": jax.device_get(state.params["guide"])},
            den, {"params": jax.device_get(state.params["den"])},
            vae_enc, vep, vae_dec, vdp,
        )
        pcfg = PipelineConfig(
            width=size, height=size, num_inference_steps=4, guidance_scale=3.5,
            context=ContextConfig(frames=min(T, 30), overlap=4),
            guidance_clip_mode="cond",
        )
        pipe = VideoPipeline(bundle, pcfg)
        ctx = np.asarray(enc.clip_encode(jnp.asarray(b["clip_img"][:1], dtype)).astype(jnp.float32))
        noise = np.random.default_rng(0).normal(size=(T, h, h, 4)).astype(np.float32)
        video = np.asarray(pipe(
            b["ref_img"][0], b["ref_skel_img"][0], b["tgt_pose"][0],
            b["tgt_face"][0], b["tgt_hand"][0], b["scene_motion"][0],
            ctx, noise,
        )).astype(np.float32) / 255.0
        path = os.path.join(out_dir, "validation", f"step_{step}.gif")
        save_video_grid([b["tgt_pose"][0], video], path, fps=8)
        print(f"validation gif: {path}")
        return path  # train_loop logs it to the tracker (mlflow artifact)

    def export_fn(step, state):
        # deployable motion-module-only dict (train_stage2.py:898-926) + full
        motion_only = ckpt_lib.filter_by_substring(
            jax.device_get(state.params["den"]), ("motion",)
        )
        ckpt_lib.export_params(motion_only, os.path.join(out_dir, f"motion_module-{step}.msgpack"))
        ckpt_lib.export_params(
            jax.device_get(state.params["guide"]),
            os.path.join(out_dir, f"reference_unet-{step}.msgpack"),
        )
        ckpt_lib.export_params(
            jax.device_get(state.params["den"]),
            os.path.join(out_dir, f"denoising_unet-{step}.msgpack"),
        )

    train_loop(
        cfg=tcfg, schedule=schedule, guide=guide, guide_params=gp, den=den,
        den_params=dp, batches=batches, prepare_batch=prepare_batch,
        max_steps=max_steps, output_dir=out_dir, run_name=exp_name,
        checkpointing_steps=int(cfg.get("checkpointing_steps", 3000)),
        seed=int(cfg.get("seed", 186)),
        export_fn=export_fn,
        save_model_steps=int(cfg.get("save_model_step_interval", 3000)),
        save_model_epochs=int(cfg.get("save_model_epoch_interval", 0)),
        validation_fn=validation_fn,
        validation_steps=int(cfg.get("validation_steps", cfg.get("val", {}).get("validation_steps", 3000))),
        # multi-chip: shard the batch over 'data' AND each clip's frames over
        # 'frame' (sequence parallelism) — the reference's full 20-frame clip
        # does not fit one 16 GB chip, see core/mesh.py::choose_train_mesh
        batch_size=bs,
        clip_frames=T,
        # frozen SD weights (everything but motion/MAN) stored in bf16: their
        # optimizer state doesn't exist and fp32 master copies are only needed
        # for TRAINED params (see train/steps.py::init_train_state)
        frozen_dtype=dtype,
    )


if __name__ == "__main__":
    main()
