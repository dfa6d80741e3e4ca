"""Motion-Adaptive Normalization (SPADE-style), NHWC.

Rebuilds ``MANModule`` (`/root/reference/src/models/man_module.py:7-33`):
instance-norm the features, then predict per-pixel (gamma, beta) from the
nearest-resized 2-channel scene-motion map through a shared 3x3 conv MLP:
``out = IN(x) * (1 + gamma) + beta``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import conv3x3


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel normalization over H, W (torch InstanceNorm2d,
    affine=False, default eps 1e-5)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def resize_nearest(m: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest-neighbor resize of (B, H, W, C) to (B, h, w, C), matching
    torch ``F.interpolate(mode="nearest")`` index arithmetic (floor of the
    source coordinate scaled by in/out)."""
    B, H, W, C = m.shape
    rows = (jnp.arange(h) * H // h).astype(jnp.int32)
    cols = (jnp.arange(w) * W // w).astype(jnp.int32)
    return m[:, rows][:, :, cols]


class MANBlock(nn.Module):
    nhidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, motion_map: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C) features; motion_map: (B, Hm, Wm, 2)."""
        normalized = instance_norm(x)
        m = resize_nearest(motion_map, x.shape[1], x.shape[2]).astype(self.dtype)
        actv = nn.relu(conv3x3(self.nhidden, self.dtype, "mlp_shared")(m))
        gamma = conv3x3(x.shape[-1], self.dtype, "mlp_gamma")(actv)
        beta = conv3x3(x.shape[-1], self.dtype, "mlp_beta")(actv)
        return normalized * (1.0 + gamma) + beta
