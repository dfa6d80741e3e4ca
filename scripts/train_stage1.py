"""Stage-1 trainer: reference UNet (MIX_CHAR, 20ch) + 2D denoising UNet on
single frames. TPU-native rebuild of `/root/reference/scripts/train_stage1.py`
(config schema mirrors `configs/train/train_stage1.yaml`).

Usage:
    python -m scripts.train_stage1 --config configs/train/train_stage1.yaml
    python -m scripts.train_stage1 --config configs/train/train_stage1.yaml --synthetic 64
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
    p.add_argument("--synthetic", type=int, default=0,
                   help="run on N synthetic samples (smoke/benchmark mode)")
    p.add_argument("--max_steps", type=int, default=None)
    return p.parse_args()


def synthetic_batches(n, bs, size, steps):
    rng = np.random.default_rng(0)
    for _ in range(steps):
        yield {
            "ref_img": rng.uniform(-1, 1, (bs, size, size, 3)).astype(np.float32),
            "tgt_img": rng.uniform(-1, 1, (bs, size, size, 3)).astype(np.float32),
            "ref_skel_img": rng.uniform(0, 1, (bs, size, size, 3)).astype(np.float32),
            "tgt_pose_img": rng.uniform(0, 1, (bs, size, size, 3)).astype(np.float32),
            "tgt_face_img": rng.uniform(0, 1, (bs, size, size, 3)).astype(np.float32),
            "tgt_hand_img": rng.uniform(0, 1, (bs, size, size, 3)).astype(np.float32),
            "clip_img": rng.normal(0, 1, (bs, 224, 224, 3)).astype(np.float32),
        }


def main():
    args = parse_args()
    with open(args.config) as f:
        cfg = yaml.safe_load(f)

    # Multi-host pods (the accelerate-launch analog, SURVEY §5.8): every host
    # runs this same script; jax.distributed wires the global mesh and the
    # XLA collectives ride ICI/DCN. Correctness relies on the loaders being
    # deterministic in `seed` (they are: host RNGs and jax keys all derive
    # from cfg.seed), so each host materializes the SAME global batch and
    # device_put keeps only its addressable shards. Single-host runs skip it.
    if int(os.environ.get("MIKUDANCE_MULTIHOST", "0")):
        jax.distributed.initialize()

    from mikudance_tpu.core import loaders
    from mikudance_tpu.diffusion.ddim import DDIMSchedule
    from mikudance_tpu.train import checkpoint as ckpt_lib
    from mikudance_tpu.train.runner import make_encoder_fns, train_loop
    from mikudance_tpu.train.steps import TrainConfig

    data_cfg = cfg.get("data", {})
    solver = cfg.get("solver", {})
    size = int(data_cfg.get("train_width", 768))
    bs = int(data_cfg.get("train_bs", 8))
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

    # stage 1: reference UNet without MAN (MIX_CHAR, `unet_2d_mix_char.py`),
    # denoising UNet without motion modules (`train_stage1.py:279-283`)
    remat = bool(solver.get("gradient_checkpointing", False))
    guide, gp = loaders.load_guidance_params(
        cfg.get("pretrained_reference_unet"), use_man=False, dtype=dtype, latent_hw=h,
        unet_config=unet_cfg, remat=remat,
    )
    den, dp = loaders.load_denoising_params(
        cfg.get("pretrained_denoising_unet"), use_motion=False, dtype=dtype, latent_hw=h,
        unet_config=unet_cfg, remat=remat,
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
        # Accelerate convention: lr scales with the global batch. Here the
        # HOST batch is already global (one bs-sample batch sharded over the
        # data mesh), unlike the reference's per-process loaders — so no
        # device-count factor.
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
        trainable_substrings=None,  # stage 1 trains both UNets fully
        lr_scheduler=solver.get("lr_scheduler", "constant"),
        lr_warmup_steps=int(solver.get("lr_warmup_steps", 0)),
        max_train_steps=int(solver.get("max_train_steps", 0)),
        gradient_accumulation_steps=accum,
    )

    enc_rng = {"key": jax.random.PRNGKey(cfg.get("seed", 186))}

    def prepare_batch(batch, host_rng: random.Random):
        enc_rng["key"], sub = jax.random.split(enc_rng["key"])
        lat = enc.vae_encode_sample(sub, jnp.asarray(batch["tgt_img"], dtype))
        conds = jnp.concatenate(
            [jnp.asarray(batch[k], dtype) for k in
             ("ref_img", "ref_skel_img", "tgt_pose_img", "tgt_face_img", "tgt_hand_img")],
            axis=0,
        )
        cond_lat = enc.vae_encode_mean(conds)
        B = lat.shape[0]
        parts = [cond_lat[i * B:(i + 1) * B] for i in range(5)]
        cond20 = jnp.concatenate(parts, axis=-1)
        ctx = enc.clip_encode(jnp.asarray(batch["clip_img"], dtype))
        uncond = float(host_rng.random() < tcfg.uncond_ratio)  # batch-level flip (:505)
        return {
            "latents": lat[:, None].astype(jnp.float32),
            "cond20": cond20[:, None].astype(jnp.float32),
            "motion": jnp.zeros((B, 1) + cond20.shape[1:3] + (2,), jnp.float32),
            "clip_ctx": ctx.astype(jnp.float32),
            "uncond": jnp.full((B,), uncond, jnp.float32),
        }

    exp_name = cfg.get("exp_name", "train_stage1_mikudance")
    out_dir = os.path.join(cfg.get("output_dir", "./train_output"), exp_name)
    max_steps = args.max_steps or int(solver.get("max_train_steps", 120000))

    val_batch = {"holder": None}  # filled by the first batch; used by validation_fn

    def _capture(it):
        for bt in it:
            if val_batch["holder"] is None:
                val_batch["holder"] = bt
            yield bt

    if args.synthetic:
        batches = _capture(synthetic_batches(args.synthetic, bs, size, max_steps))
    else:
        import json

        from mikudance_tpu.data.datasets import AnimeImageDataset, ImageSample, PrefetchLoader

        with open(cfg["data_manifest"]) as f:
            manifest = json.load(f)
        ds = AnimeImageDataset(
            [ImageSample(**s) for s in manifest],
            img_size=(size, size),
            drop_ratio=float(data_cfg.get("drop_ratio", 0.1)),
            style_ratio=float(data_cfg.get("style_ratio", 0.01)),
        )
        loader = PrefetchLoader(ds, bs)
        # zero-arg factory: train_loop re-invokes it per epoch (each __iter__
        # reshuffles) so a 120k-step run cycles the dataset like the
        # reference's epoch loop (`train_stage1.py:470-478`).
        batches = lambda: _capture(iter(loader))

    def validation_fn(step, state):
        """Golden-fixture validation: run the stage-1 image pipeline with the
        CURRENT weights and save a comparison image (the reference's
        log_validation, `train_stage1.py:124-210,683-706`)."""
        if val_batch["holder"] is None:
            return
        import numpy as np
        from PIL import Image

        from mikudance_tpu.core.configs import PipelineConfig
        from mikudance_tpu.pipelines.image import ImagePipeline
        from mikudance_tpu.pipelines.video import ModelBundle

        b = val_batch["holder"]
        bundle = ModelBundle(
            guide, {"params": jax.device_get(state.params["guide"])},
            den, {"params": jax.device_get(state.params["den"])},
            vae_enc, vep, vae_dec, vdp,
        )
        pcfg = PipelineConfig(
            width=size, height=size, num_inference_steps=4, guidance_scale=3.5,
        )
        pipe = ImagePipeline(bundle, pcfg)
        ctx = np.asarray(enc.clip_encode(jnp.asarray(b["clip_img"][:1], dtype)).astype(jnp.float32))
        noise = np.random.default_rng(0).normal(size=(1, size // 8, size // 8, 4)).astype(np.float32)
        img = np.asarray(pipe(
            b["ref_img"][0], b["ref_skel_img"][0], b["tgt_pose_img"][0],
            b["tgt_face_img"][0], b["tgt_hand_img"][0], ctx, noise,
        ))[0]
        ref_u8 = ((b["ref_img"][0] + 1) * 127.5).clip(0, 255).astype(np.uint8)
        pose_u8 = (b["tgt_pose_img"][0] * 255).clip(0, 255).astype(np.uint8)
        grid = np.concatenate([ref_u8, pose_u8, img], axis=1)
        path = os.path.join(out_dir, "validation", f"step_{step}.png")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(grid).save(path)
        print(f"validation image: {path}")
        return path  # train_loop logs it to the tracker (mlflow artifact)

    def export_fn(step, state):
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
        # stage 1 trains BOTH UNets (~1.7B params): replicated fp32 state is
        # ~27 GB/chip, over a 16 GB v5e — shard params + Adam state over the
        # data mesh (ZeRO/FSDP-style, core/mesh.py::zero_shard_state)
        zero_shard=bool(solver.get("optimizer_state_sharding", True)),
        save_model_epochs=int(cfg.get("save_model_epoch_interval", 0)),
        save_model_steps=int(cfg.get("save_model_step_interval", 3000)),
        validation_fn=validation_fn,
        validation_steps=int(cfg.get("validation_steps", cfg.get("val", {}).get("validation_steps", 3000))),
    )


if __name__ == "__main__":
    main()
