"""Stage-1 single-frame pose-to-image pipeline.

Rebuilds ``Pose2ImagePipeline`` (`/root/reference/src/pipelines/pipeline_stage1_img.py:192`):
20-channel condition stack (no scene motion), banks computed once (the
reference runs the guidance UNet only at step 0, `:348-359` — equivalent to
our static banks), CFG over a batch of 2, plain DDIM loop, single-frame VAE
decode. Implemented as the T=1 special case of the video machinery.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.configs import PipelineConfig
from ..diffusion.ddim import DDIMSchedule, inference_step_pairs
from .video import SD_LATENT_SCALE, ModelBundle, build_condition_stack, encode_frames


class ImagePipeline:
    def __init__(
        self,
        bundle: ModelBundle,
        config: PipelineConfig = PipelineConfig(),
        schedule: Optional[DDIMSchedule] = None,
    ):
        self.bundle = bundle
        self.config = config
        self.schedule = schedule or DDIMSchedule.create(
            beta_schedule=config.scheduler.beta_schedule,
            prediction_type=config.scheduler.prediction_type,
            rescale_betas_zero_snr=config.scheduler.rescale_betas_zero_snr,
        )
        self._encode_jit = jax.jit(
            lambda p, f: encode_frames(self.bundle.vae_enc, p, f)
        )
        self._banks_jit = jax.jit(self._banks)
        self._denoise_jit = jax.jit(self._denoise)
        self._decode_jit = jax.jit(self._decode)

    def _banks(self, gp, cond20, ctx_cond):
        # NOTE: `guidance_clip_mode` is a VIDEO-pipeline quirk only. The
        # reference image pipeline passes the cond embed straight to the
        # reference UNet (`pipeline_stage1_img.py:348-359`); do not copy the
        # video pipeline's interleaved [uncond, cond] tiling here.
        d = self.bundle.guide.dtype
        return self.bundle.guide.apply(
            gp, cond20.astype(d), None, jnp.zeros((1,), jnp.int32), ctx_cond.astype(d)
        )

    def _denoise(self, dp, noise, banks, ctx_cond, ts, prev_ts, scale):
        from ..models.unet import (bank_keys, precompute_context_kv,
                                   precompute_reference_kv)

        d = self.bundle.den.dtype
        # step-invariant K/V hoisted out of the scan (see pipelines/video.py)
        banks_kv = precompute_reference_kv(dp, banks, d)
        banks2 = {
            k: (jnp.concatenate([jnp.zeros_like(kk), kk], 0),
                jnp.concatenate([jnp.zeros_like(vv), vv], 0))
            for k, (kk, vv) in banks_kv.items()
        }
        ctx2 = jnp.concatenate([jnp.zeros_like(ctx_cond), ctx_cond], 0).astype(d)
        ctx_kv2 = precompute_context_kv(
            dp, ctx2, bank_keys(self.bundle.den.cfg.unet), d
        )

        def step(x, t_pair):
            t, tp = t_pair
            batch = jnp.concatenate([x, x], axis=0)[:, None].astype(d)  # (2,1,h,w,4)
            pred = self.bundle.den.apply(
                dp, batch, jnp.full((2,), t, jnp.int32), ctx2,
                banks_kv=banks2, ctx_kv=ctx_kv2,
            )[:, 0].astype(jnp.float32)
            noise_pred = pred[0:1] + scale * (pred[1:2] - pred[0:1])
            return self.schedule.step(noise_pred, t, tp, x), None

        x, _ = jax.lax.scan(step, noise.astype(jnp.float32), (ts, prev_ts))
        return x

    def _decode(self, dcp, latents):
        img = self.bundle.vae_dec.apply(dcp, latents / SD_LATENT_SCALE)
        img = jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255.0).astype(jnp.uint8)

    def __call__(
        self,
        ref_image: np.ndarray,  # (H, W, 3) in [-1, 1]
        ref_skel: np.ndarray,  # (H, W, 3) in [0, 1]
        pose: np.ndarray,  # (H, W, 3) in [0, 1]
        face: np.ndarray,
        hand: np.ndarray,
        clip_context: np.ndarray,  # (1, S, 768)
        noise: np.ndarray,  # (1, h, w, 4)
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        decode: bool = True,
    ):
        steps = num_inference_steps or self.config.num_inference_steps
        scale = (
            self.config.guidance_scale if guidance_scale is None else guidance_scale
        )
        frames = jnp.stack(
            [jnp.asarray(a) for a in (ref_image, ref_skel, pose, face, hand)], axis=0
        )
        lat = self._encode_jit(self.bundle.vae_enc_params, frames)
        cond20 = build_condition_stack(
            lat[0:1], lat[1:2], lat[2:3], lat[3:4], lat[4:5]
        )
        ctx = jnp.asarray(clip_context)
        banks = self._banks_jit(self.bundle.guide_params, cond20, ctx)
        ts, prev_ts = inference_step_pairs(self.schedule, steps)
        latents = self._denoise_jit(
            self.bundle.den_params, jnp.asarray(noise), banks, ctx,
            jnp.asarray(ts), jnp.asarray(prev_ts), jnp.float32(scale),
        )
        if not decode:
            return latents
        return self._decode_jit(self.bundle.vae_dec_params, latents)
