"""SD KL autoencoder (sd-vae-ft-mse geometry), NHWC Flax.

Rebuilds diffusers' ``AutoencoderKL`` as used by the reference
(`/root/reference/scripts/inference_video.py:72-79`; encode with
``latent_dist.mean * 0.18215`` at `pipeline_mikudance.py:466-467`, decode with
``1/0.18215`` at `:117`). Geometry: f8, block_out_channels (128,256,512,512),
2 layers/block, single-head mid attention, GroupNorm eps 1e-6.

TPU notes: the VAE downsampler uses torch's asymmetric (0,1) padding — kept
explicit here for weight parity. Frames of a video are batched (the reference
encodes frame-at-a-time in a Python loop, `pipeline_mikudance.py:483-549`; we
fold frames into the batch axis instead).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.configs import VAEConfig
from .layers import run_attention
from .layers import FusedGroupNorm
from .resnet import conv3x3


class VAEResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = FusedGroupNorm(self.norm_groups, 1e-6, act="silu", dtype=self.dtype,
                           name="norm1")(x)
        h = conv3x3(self.out_channels, self.dtype, "conv1")(h)
        h = FusedGroupNorm(self.norm_groups, 1e-6, act="silu", dtype=self.dtype,
                           name="norm2")(h)
        h = conv3x3(self.out_channels, self.dtype, "conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (mid block)."""

    channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = FusedGroupNorm(self.norm_groups, 1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        # single head of width C; at 768^2 this is a 9216-token attention and
        # routes through the Pallas flash kernel like the UNet levels.
        h = run_attention(q, k, v, 1)
        h = nn.Dense(C, dtype=self.dtype, name="to_out")(h)
        return x + h.reshape(B, H, W, C)


class VAEDownsample(nn.Module):
    """Asymmetric (0,1) pad + 3x3 stride-2 conv (torch VAE downsampler)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2),
            padding=((0, 1), (0, 1)), dtype=self.dtype, name="conv",
        )(x)


class VAEUpsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from .resnet import nearest_2x

        return conv3x3(self.out_channels, self.dtype, "conv")(nearest_2x(x))


class Encoder(nn.Module):
    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = self.cfg.block_out_channels
        g = self.cfg.norm_num_groups
        h = conv3x3(ch[0], self.dtype, "conv_in")(x.astype(self.dtype))
        for i, c in enumerate(ch):
            for j in range(self.cfg.layers_per_block):
                h = VAEResnetBlock(c, g, self.dtype, name=f"down_{i}_res_{j}")(h)
            if i < len(ch) - 1:
                h = VAEDownsample(c, self.dtype, name=f"down_{i}_down")(h)
        h = VAEResnetBlock(ch[-1], g, self.dtype, name="mid_res_0")(h)
        h = VAEAttention(ch[-1], g, self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(ch[-1], g, self.dtype, name="mid_res_1")(h)
        h = FusedGroupNorm(g, 1e-6, act="silu", dtype=self.dtype,
                           name="conv_norm_out")(h)
        h = conv3x3(2 * self.cfg.latent_channels, self.dtype, "conv_out")(h)
        h = nn.Conv(2 * self.cfg.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")(h)
        return h  # (B, H/8, W/8, 8) moments: [mean(4) | logvar(4)]


class Decoder(nn.Module):
    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32
    # frames are independent; chunking is purely an HBM knob (the reference
    # decodes frame-at-a-time, `pipeline_mikudance.py:115-130`)
    decode_chunk: int = 4
    frames_coupled: bool = False  # safe to shard individual frames

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        ch = self.cfg.block_out_channels
        g = self.cfg.norm_num_groups
        rev = list(reversed(ch))  # (512, 512, 256, 128)
        h = nn.Conv(self.cfg.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")(
            z.astype(self.dtype)
        )
        h = conv3x3(rev[0], self.dtype, "conv_in")(h)
        h = VAEResnetBlock(rev[0], g, self.dtype, name="mid_res_0")(h)
        h = VAEAttention(rev[0], g, self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(rev[0], g, self.dtype, name="mid_res_1")(h)
        for i, c in enumerate(rev):
            for j in range(self.cfg.layers_per_block + 1):
                h = VAEResnetBlock(c, g, self.dtype, name=f"up_{i}_res_{j}")(h)
            if i < len(rev) - 1:
                h = VAEUpsample(c, self.dtype, name=f"up_{i}_up")(h)
        h = FusedGroupNorm(g, 1e-6, act="silu", dtype=self.dtype,
                           name="conv_norm_out")(h)
        return conv3x3(self.cfg.out_channels, self.dtype, "conv_out")(h)


def latent_mean(moments: jnp.ndarray, latent_channels: int = 4) -> jnp.ndarray:
    return moments[..., :latent_channels]


def latent_sample(
    moments: jnp.ndarray, rng: jax.Array, latent_channels: int = 4
) -> jnp.ndarray:
    mean = moments[..., :latent_channels]
    logvar = jnp.clip(moments[..., latent_channels:], -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
