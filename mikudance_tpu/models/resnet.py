"""Resnet blocks and spatial up/down sampling (NHWC).

Rebuilds the diffusers/reference primitives (`/root/reference/src/models/resnet.py`):
"inflated" 3D convs are 2D convs with frames folded into the batch axis
(`resnet.py:9-17` literally rearranges ``b c f h w -> (b f) c h w``), so here
everything is 2D on (B*T, H, W, C) and the fold happens in the UNet.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import FusedGroupNorm


class FusedConv3x3(nn.Module):
    """3x3 stride-1 SAME conv, param-compatible with ``nn.Conv`` (same
    kernel/bias names and shapes), running the Pallas implicit-GEMM kernel on
    TPU (kernels/conv2d.py) and the XLA conv elsewhere."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..kernels.conv2d import conv3x3_fused

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return conv3x3_fused(x.astype(self.dtype), kernel, bias).astype(self.dtype)


def conv3x3(features: int, dtype=jnp.float32, name: Optional[str] = None, stride: int = 1):
    # Explicit ((1,1),(1,1)) padding matches torch Conv2d(k=3, p=1) for every
    # stride (jax 'SAME' pads asymmetrically for stride 2).
    # NOTE: measured end-to-end, XLA's in-graph convs (85-92 TF/s standalone,
    # with fused bias/silu/residual epilogues) beat routing through the Pallas
    # kernel (kernels/conv2d.py, ~70-93 TF/s but epilogues unfused): 28.9 s vs
    # 29.8 s on the headline bench — so the model path stays on nn.Conv and
    # FusedConv3x3 remains available for shapes where XLA's layout choices
    # degrade (it forces row-major operands). conv2d.PREFER_PALLAS flips the
    # stride-1 convs onto the kernel (the whole-loop row-major experiment).
    from ..kernels import conv2d as _conv2d

    if stride == 1 and _conv2d.PREFER_PALLAS:
        return FusedConv3x3(features, dtype, name=name)
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dtype=dtype,
        name=name,
    )


class ResnetBlock(nn.Module):
    """GN-silu-conv -> +time -> GN-silu-conv, with 1x1 shortcut on width change."""

    out_channels: int
    norm_groups: int = 32
    eps: float = 1e-5
    use_time_emb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None):
        h = FusedGroupNorm(self.norm_groups, self.eps, act="silu",
                           dtype=self.dtype, name="norm1")(x)
        h = conv3x3(self.out_channels, self.dtype, "conv1")(h)

        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]

        h = FusedGroupNorm(self.norm_groups, self.eps, act="silu",
                           dtype=self.dtype, name="norm2")(h)
        h = conv3x3(self.out_channels, self.dtype, "conv2")(h)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class Downsample(nn.Module):
    """3x3 stride-2 conv (torch padding=1)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return conv3x3(self.out_channels, self.dtype, "conv", stride=2)(x)


def nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample of (B, H, W, C) in ONE pass:
    two chained ``jnp.repeat`` calls materialize the intermediate (B, 2H,
    W, C) tensor — a full extra HBM round-trip on multi-100-MB activations
    (the UNet's and VAE decoder's up paths both hit this at 768^2)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


class Upsample(nn.Module):
    """Nearest 2x + 3x3 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return conv3x3(self.out_channels, self.dtype, "conv")(nearest_2x(x))
