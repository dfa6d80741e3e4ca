"""Swin Transformer backbone (Swin-T), Flax/NHWC.

Rebuilds the UniPose backbone (`/root/reference/src/XPose/models/UniPose/
swin_transformer.py:429`, built at `:653` as swin_T_224_1k: embed 96, depths
(2,2,6,2), heads (3,6,12,24), window 7), returning the stage 1..3 feature
maps (`config_model/UniPose_SwinT.py` return_interm_indices=[1,2,3]).

TPU notes: window partition/merge are reshapes+transposes that XLA fuses; the
(49 x 49) window attention batches over (B * num_windows) and runs dense (it
is tiny). Relative position bias is a learned (2W-1)^2 table gathered with a
static index matrix.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.layers import dot_product_attention


def relative_position_index(window: int) -> np.ndarray:
    """(W^2, W^2) indices into the (2W-1)^2 bias table (swin_transformer.py)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, W^2, W^2)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None) -> jnp.ndarray:
        """x: (B_windows, W^2, C); mask: (num_win, W^2, W^2) or None."""
        Bw, N, C = x.shape
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.heads
        scale = hd ** -0.5

        q = q.reshape(Bw, N, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(Bw, N, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(Bw, N, self.heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads),
        )
        idx = jnp.asarray(relative_position_index(self.window))
        bias = table[idx.reshape(-1)].reshape(N, N, self.heads).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(Bw // nw, nw, self.heads, N, N)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bw, self.heads, N, N)

        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def window_merge(x: jnp.ndarray, w: int, B: int, H: int, W: int) -> jnp.ndarray:
    C = x.shape[-1]
    x = x.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def shift_mask(H: int, W: int, window: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (-100 off-region), (num_win, W^2, W^2)."""
    img = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    # pure-numpy window partition (this runs at trace time)
    wins = img.reshape(H // window, window, W // window, window)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        w = self.window
        pad_h = (-H) % w
        pad_w = (-W) % w
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        mask = None
        if self.shift > 0:
            h = jnp.roll(h, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shift_mask(Hp, Wp, w, self.shift))

        win = window_partition(h, w)
        win = WindowAttention(self.dim, self.heads, w, self.dtype, name="attn")(win, mask)
        h = window_merge(win, w, B, Hp, Wp)

        if self.shift > 0:
            h = jnp.roll(h, (self.shift, self.shift), axis=(1, 2))
        h = h[:, :H, :W]
        x = shortcut + h

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-T by default; returns stage features selected by out_indices."""

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        """x: (B, H, W, 3) -> list of (B, H/2^(i+2), W/2^(i+2), C_i) features."""
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        outs = []
        dim = self.embed_dim
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                shift = 0 if j % 2 == 0 else self.window // 2
                x = SwinBlock(dim, self.heads[i], self.window, shift,
                              dtype=self.dtype, name=f"stage_{i}_block_{j}")(x)
            if i in self.out_indices:
                o = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm_{i}")(x)
                outs.append(o)
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, self.dtype, name=f"merge_{i}")(x)
                dim *= 2
        return outs
