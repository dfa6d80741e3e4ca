"""Temporal VAE decoder (SVD/Latte ``AutoencoderKLTemporalDecoder`` geometry).

The reference's ``--video_decoder`` flag swaps the SD VAE for the Latte-1
``vae_temporal_decoder`` (`/root/reference/scripts/inference_video.py:72-79`;
weights fetched at `tools/download_weights.py` "vae_temporal_decoder"),
decoding 16-frame chunks with cross-frame temporal convolutions
(`pipeline_mikudance.py:132-150`). The encoder is the standard SD encoder;
only the decoder differs:

- SpatioTemporalResBlock = spatial ResnetBlock + temporal (3,1,1)-conv
  ResnetBlock over frames + learned sigmoid alpha blend.
- mid block: res -> single-head attention -> res; 4 up blocks of 3 resnets.
- final ``time_conv_out``: a (3,1,1) temporal conv on the RGB output.

Layout: the decoder takes one chunk (T, h, w, 4) NHWC; temporal convs run as
1-D convolutions along the frame axis with channel mixing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.configs import VAEConfig
from .resnet import conv3x3
from .layers import FusedGroupNorm as _FGN
from .vae import VAEAttention, VAEUpsample


class TemporalConv(nn.Module):
    """torch Conv3d(C_in, C_out, kernel=(3,1,1), padding=(1,0,0)) over frames.

    Input (T, H, W, C): a 1-D conv along T with full channel mixing.

    ``frame_axis``: when the chunk's frames are sharded over a mesh axis
    (each device holds T_local consecutive frames), the kernel's 1-frame
    receptive overlap is satisfied by a halo exchange: each device receives
    its neighbours' edge frames via ``ppermute`` and runs a VALID conv.
    Devices at the chunk boundary receive zeros from ppermute (no source in
    the permutation), which is exactly the torch zero padding (1,0,0).
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    frame_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        T, H, W, C = x.shape
        if self.frame_axis is None:
            y = x.reshape(1, T, H * W, C)
            y = nn.Conv(
                self.out_channels, (3, 1), padding=((1, 1), (0, 0)),
                dtype=self.dtype, name="conv",
            )(y)
            return y.reshape(T, H, W, self.out_channels)
        ax = self.frame_axis
        n = jax.lax.psum(1, ax)
        fwd = [(i, i + 1) for i in range(n - 1)]
        bwd = [(i + 1, i) for i in range(n - 1)]
        left = jax.lax.ppermute(x[T - 1 :], ax, fwd)   # my left halo
        right = jax.lax.ppermute(x[:1], ax, bwd)       # my right halo
        xp = jnp.concatenate([left, x, right], axis=0)  # (T+2, H, W, C)
        y = xp.reshape(1, T + 2, H * W, C)
        y = nn.Conv(
            self.out_channels, (3, 1), padding="VALID",
            dtype=self.dtype, name="conv",
        )(y)
        return y.reshape(T, H, W, self.out_channels)


class JointGroupNorm(nn.Module):
    """GroupNorm whose stats pool jointly over (T, H, W) — the torch
    GroupNorm on the (B, C, T, H, W) video tensor. Parameter-compatible with
    ``FusedGroupNorm`` (scale/bias of shape (C,)). With ``frame_axis`` the
    moments are psum'd across the frame shards, so sharded == unsharded."""

    num_groups: int
    epsilon: float = 1e-6
    act: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    frame_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        T, H, W, C = x.shape
        G = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        xf = x.astype(jnp.float32).reshape(T * H * W, G, C // G)
        cnt = jnp.float32(T * H * W * (C // G))
        s1 = jnp.sum(xf, axis=(0, 2))
        s2 = jnp.sum(jnp.square(xf), axis=(0, 2))
        if self.frame_axis is not None:
            s1 = jax.lax.psum(s1, self.frame_axis)
            s2 = jax.lax.psum(s2, self.frame_axis)
            cnt = cnt * jax.lax.psum(1, self.frame_axis)
        mu = s1 / cnt
        var = s2 / cnt - jnp.square(mu)
        a = jax.lax.rsqrt(var + self.epsilon)  # (G,)
        a_c = jnp.repeat(a, C // G) * scale
        b_c = bias - jnp.repeat(mu, C // G) * jnp.repeat(a, C // G) * scale
        y = x.astype(jnp.float32) * a_c + b_c
        if self.act == "silu":
            y = y * jax.nn.sigmoid(y)
        return y.astype(self.dtype)


class TemporalResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    frame_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch applies GroupNorm to the (B, C, T, H, W) video tensor: the
        # stats pool over frames too, unlike the per-frame spatial norms.
        # Folding T into the row axis gives the same joint (T,H,W) pooling;
        # under frame sharding the moments are psum'd instead (JointGroupNorm).
        T, H, W, C = x.shape
        if self.frame_axis is None:
            joint = lambda m, v: m(v.reshape(1, T * H, W, C)).reshape(T, H, W, C)
            norm1 = lambda v: joint(_FGN(self.norm_groups, 1e-6, act="silu",
                                         dtype=self.dtype, name="norm1"), v)
            norm2 = lambda v: joint(_FGN(self.norm_groups, 1e-6, act="silu",
                                         dtype=self.dtype, name="norm2"), v)
        else:
            norm1 = JointGroupNorm(self.norm_groups, 1e-6, act="silu",
                                   dtype=self.dtype, frame_axis=self.frame_axis,
                                   name="norm1")
            norm2 = JointGroupNorm(self.norm_groups, 1e-6, act="silu",
                                   dtype=self.dtype, frame_axis=self.frame_axis,
                                   name="norm2")
        h = norm1(x)
        h = TemporalConv(self.out_channels, self.dtype, self.frame_axis, name="conv1")(h)
        h = norm2(h)
        h = TemporalConv(self.out_channels, self.dtype, self.frame_axis, name="conv2")(h)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """Spatial resnet -> temporal resnet -> learned alpha blend
    (diffusers ``SpatioTemporalResBlock`` with merge_strategy="learned")."""

    out_channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    frame_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # spatial part (frames folded in batch implicitly: T is the batch
        # axis, so frame sharding needs no changes here)
        h = _FGN(self.norm_groups, 1e-6, act="silu", dtype=self.dtype, name="spatial_norm1")(x)
        h = conv3x3(self.out_channels, self.dtype, "spatial_conv1")(h)
        h = _FGN(self.norm_groups, 1e-6, act="silu", dtype=self.dtype, name="spatial_norm2")(h)
        h = conv3x3(self.out_channels, self.dtype, "spatial_conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="spatial_conv_shortcut")(x)
        spatial = x + h

        temporal = TemporalResnetBlock(
            self.out_channels, self.norm_groups, self.dtype,
            frame_axis=self.frame_axis, name="temporal_res_block"
        )(spatial)

        mix = self.param("mix_factor", nn.initializers.constant(0.5), (1,))
        alpha = nn.sigmoid(mix.astype(jnp.float32))[0].astype(spatial.dtype)
        return alpha * spatial + (1.0 - alpha) * temporal


class TemporalDecoder(nn.Module):
    """Drop-in replacement for models.vae.Decoder (same apply signature);
    input is one chunk of frames (T, h, w, 4)."""

    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32
    # chunk size is part of the numerical contract: temporal convs couple
    # frames within a chunk, so 16 matches the reference
    # (`pipeline_mikudance.py:81,132-150`)
    decode_chunk: int = 16
    frames_coupled: bool = True  # cross-frame convs: frame sharding needs halos
    # mesh axis to shard one chunk's frames over (each device gets
    # chunk/n consecutive frames; temporal convs halo-exchange, joint
    # norms psum — exact same math as the unsharded decode)
    frame_axis: Optional[str] = None

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        rev = list(reversed(self.cfg.block_out_channels))  # (512, 512, 256, 128)
        fax = self.frame_axis
        h = conv3x3(rev[0], self.dtype, "conv_in")(z.astype(self.dtype))
        h = SpatioTemporalResBlock(rev[0], self.cfg.norm_num_groups, self.dtype,
                                   frame_axis=fax, name="mid_res_0")(h)
        h = VAEAttention(rev[0], self.cfg.norm_num_groups, self.dtype, name="mid_attn")(h)
        h = SpatioTemporalResBlock(rev[0], self.cfg.norm_num_groups, self.dtype,
                                   frame_axis=fax, name="mid_res_1")(h)
        for i, c in enumerate(rev):
            for j in range(self.cfg.layers_per_block + 1):
                h = SpatioTemporalResBlock(c, self.cfg.norm_num_groups, self.dtype,
                                           frame_axis=fax, name=f"up_{i}_res_{j}")(h)
            if i < len(rev) - 1:
                h = VAEUpsample(c, self.dtype, name=f"up_{i}_up")(h)
        h = _FGN(self.cfg.norm_num_groups, 1e-6, act="silu", dtype=self.dtype,
                 name="conv_norm_out")(h)
        h = conv3x3(self.cfg.out_channels, self.dtype, "conv_out")(h)
        return TemporalConv(self.cfg.out_channels, self.dtype, fax,
                            name="time_conv_out")(h)
