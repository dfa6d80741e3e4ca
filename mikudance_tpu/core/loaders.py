"""Checkpoint loading: reference .pth files -> ModelBundle param trees.

Mirrors the reference CLI's load sequence (`/root/reference/scripts/inference_video.py:61-119`):
- reference UNet: SD donor conv_in zero-padded to 20ch, then the released
  ``reference_unet-*.pth`` (strict) — the released dict is complete, so the
  donor is only needed when no release is given.
- denoising UNet: SD weights inflated 2D->3D (key-identical here), merged with
  the AnimateDiff/-style ``motion_module-*.pth``, then ``denoising_unet-*.pth``
  non-strict on top (`unet_3d_mix.py:600-691`).
- VAE / CLIP: diffusers & HF trees (safetensors or .bin).

When weight files are absent (e.g. this zero-egress dev machine), models fall
back to random init so the full pipeline stays smoke-testable.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip_vision import CLIPVisionTower
from ..models.unet import DenoisingUNet, GuidanceUNet
from ..models.vae import Decoder, Encoder
from . import convert as cv
from .configs import (
    DenoisingUNetConfig,
    GuidanceUNetConfig,
    MotionModuleConfig,
    UNetConfig,
)
from .params import cast_params


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pth/.bin/.safetensors file into {key: numpy} (torch on host
    only for deserialization — never in the compute path)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v for k, v in sd.items()}


def _find_weights(dirpath: str, names=("diffusion_pytorch_model", "model", "pytorch_model")):
    for n in names:
        for ext in (".safetensors", ".bin"):
            p = os.path.join(dirpath, n + ext)
            if os.path.exists(p):
                return p
    return None


def load_guidance_params(
    reference_unet_path: Optional[str],
    use_man: bool = True,
    dtype=jnp.float32,
    rng: Optional[jax.Array] = None,
    latent_hw: int = 8,
    unet_config=None,
    remat: bool = False,
):
    """GuidanceUNet params from the released reference_unet .pth (complete,
    strict load in the reference) or random init.

    ``remat``: per-block rematerialization for training (the reference's
    ``enable_gradient_checkpointing``, `train_stage2.py:425-427`); required
    to fit stage-2 backward passes in a 16 GB v5e chip (see bench_train.py).
    """
    cfg = GuidanceUNetConfig(use_man=use_man, unet=unet_config or UNetConfig())
    model = GuidanceUNet(cfg, dtype=dtype, remat=remat)
    if reference_unet_path and os.path.exists(reference_unet_path):
        sd = load_torch_state_dict(reference_unet_path)
        params = cv.convert_unet(sd, with_man=use_man, with_conv_out=False)
        return model, cast_params({"params": params}, dtype)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    h = latent_hw
    p = jax.jit(model.init)(
        rng, jnp.zeros((1, h, h, 20), dtype), jnp.zeros((1, h, h, 2), dtype),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 257, 768), dtype),
    )
    return model, cast_params(p, dtype)


def load_denoising_params(
    denoising_unet_path: Optional[str],
    motion_module_path: Optional[str] = None,
    sd_unet_path: Optional[str] = None,
    use_motion: bool = True,
    dtype=jnp.float32,
    rng: Optional[jax.Array] = None,
    latent_hw: int = 8,
    unet_config=None,
    remat: bool = False,
    motion_config: Optional[MotionModuleConfig] = None,
):
    """``motion_config``: full motion-module hyperparameters (the reference's
    ``unet_additional_kwargs.motion_module_kwargs`` from
    `configs/inference/mikudance_config.yaml`); defaults match the released
    checkpoints."""
    cfg = DenoisingUNetConfig(
        unet=unet_config or UNetConfig(),
        motion=motion_config
        or MotionModuleConfig(
            enabled=use_motion,
            num_attention_heads=(unet_config or UNetConfig()).attention_heads,
        ),
    )
    model = DenoisingUNet(cfg, dtype=dtype, remat=remat)
    have_main = denoising_unet_path and os.path.exists(denoising_unet_path)
    if have_main:
        sd: Dict[str, Any] = {}
        if sd_unet_path and os.path.exists(sd_unet_path):
            sd.update(load_torch_state_dict(sd_unet_path))
        if motion_module_path and os.path.exists(motion_module_path):
            sd = cv.merge_state_dicts(sd, load_torch_state_dict(motion_module_path))
        sd = cv.merge_state_dicts(sd, load_torch_state_dict(denoising_unet_path))
        params = cv.convert_unet(sd, with_motion=use_motion, with_conv_out=True)
        return model, cast_params({"params": params}, dtype)
    rng = rng if rng is not None else jax.random.PRNGKey(1)
    h = latent_hw
    p = jax.jit(model.init)(
        rng, jnp.zeros((1, 1, h, h, 4), dtype), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 257, 768), dtype),
    )
    return model, cast_params(p, dtype)


def load_vae_params(vae_dir: Optional[str], dtype=jnp.float32, rng=None, hw: int = 64):
    enc, dec = Encoder(dtype=dtype), Decoder(dtype=dtype)
    wfile = _find_weights(vae_dir) if vae_dir and os.path.isdir(vae_dir) else None
    if wfile:
        sd = load_torch_state_dict(wfile)
        ep = {"params": cv.convert_vae_encoder(sd)}
        dp = {"params": cv.convert_vae_decoder(sd)}
        return enc, cast_params(ep, dtype), dec, cast_params(dp, dtype)
    rng = rng if rng is not None else jax.random.PRNGKey(2)
    ep = jax.jit(enc.init)(rng, jnp.zeros((1, hw, hw, 3), dtype))
    dp = jax.jit(dec.init)(rng, jnp.zeros((1, hw // 8, hw // 8, 4), dtype))
    return enc, cast_params(ep, dtype), dec, cast_params(dp, dtype)


def load_clip_params(image_encoder_dir: Optional[str], dtype=jnp.float32, rng=None):
    tower = CLIPVisionTower(dtype=dtype)
    wfile = (
        _find_weights(image_encoder_dir)
        if image_encoder_dir and os.path.isdir(image_encoder_dir)
        else None
    )
    if wfile:
        sd = load_torch_state_dict(wfile)
        return tower, cast_params({"params": cv.convert_clip_vision(sd)}, dtype)
    rng = rng if rng is not None else jax.random.PRNGKey(3)
    p = jax.jit(tower.init)(rng, jnp.zeros((1, 224, 224, 3), dtype))
    return tower, cast_params(p, dtype)


def load_temporal_decoder_params(vae_dir: Optional[str], dtype=jnp.float32, rng=None, hw: int = 64):
    """Latte/SVD temporal decoder (the --video_decoder path)."""
    from ..models.vae_temporal import TemporalDecoder

    dec = TemporalDecoder(dtype=dtype)
    wfile = _find_weights(vae_dir) if vae_dir and os.path.isdir(vae_dir) else None
    if wfile:
        sd = load_torch_state_dict(wfile)
        return dec, cast_params({"params": cv.convert_temporal_decoder(sd)}, dtype)
    rng = rng if rng is not None else jax.random.PRNGKey(4)
    p = jax.jit(dec.init)(rng, jnp.zeros((2, hw // 8, hw // 8, 4), dtype))
    return dec, cast_params(p, dtype)
