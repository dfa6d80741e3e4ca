"""Multi-scale deformable attention (UniPose / Deformable-DETR core op).

The reference implements this as its only native code — a CUDA extension
(`/root/reference/src/XPose/models/UniPose/ops/src/cuda/ms_deform_im2col_cuda.cuh`)
with a pure-PyTorch numerical spec
(`ops/functions/ms_deform_attn_func.py:41`, grid_sample-based). Here:

- ``ms_deform_attn`` — dense jnp implementation (the TPU path; gather-based
  bilinear sampling, static level loop). Works under jit/grad.
- ``mikudance_tpu.toolbox.native`` — a C++ CPU kernel (ctypes) mirroring the
  reference's native component for host-side use and as a second
  implementation for the parity test matrix (the reference's CPU file is an
  unimplemented stub, `ops/src/cpu/ms_deform_attn_cpu.cpp:1-41`).

Semantics (matching the reference spec): sampling locations are in [0, 1]
per level; bilinear sampling uses align_corners=False with zero padding
outside; output is the attention-weighted sum over levels and points.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_sample_level(
    value_l: jnp.ndarray,  # (B, H_heads, h, w, D)
    loc: jnp.ndarray,  # (B, H_heads, Q, P, 2) in [0,1] (x, y)
) -> jnp.ndarray:
    """Zero-padded bilinear sampling, align_corners=False. -> (B, Hh, Q, P, D)"""
    B, Hh, h, w, D = value_l.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        # (B, Hh, Q, P) index into (B, Hh, h, w, D)
        b_idx = jnp.arange(B)[:, None, None, None]
        h_idx = jnp.arange(Hh)[None, :, None, None]
        v = value_l[b_idx, h_idx, yc, xc]  # (B, Hh, Q, P, D)
        return v * inside[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx0, wx1 = (1 - dx)[..., None], dx[..., None]
    wy0, wy1 = (1 - dy)[..., None], dy[..., None]
    return (v00 * wx0 + v01 * wx1) * wy0 + (v10 * wx0 + v11 * wx1) * wy1


def ms_deform_attn(
    value: jnp.ndarray,  # (B, S, H_heads, D), S = sum(h_l * w_l)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(h, w)] per level
    sampling_locations: jnp.ndarray,  # (B, Q, H_heads, L, P, 2) in [0,1]
    attention_weights: jnp.ndarray,  # (B, Q, H_heads, L, P)
) -> jnp.ndarray:
    """Returns (B, Q, H_heads * D)."""
    B, S, Hh, D = value.shape
    L = len(spatial_shapes)
    P = sampling_locations.shape[-2]
    Q = sampling_locations.shape[1]

    out = jnp.zeros((B, Hh, Q, D), value.dtype)
    offset = 0
    for l, (h, w) in enumerate(spatial_shapes):
        v = value[:, offset : offset + h * w]  # (B, hw, Hh, D)
        v = v.transpose(0, 2, 1, 3).reshape(B, Hh, h, w, D)
        loc = sampling_locations[:, :, :, l].transpose(0, 2, 1, 3, 4)  # (B,Hh,Q,P,2)
        sampled = _bilinear_sample_level(v, loc)  # (B, Hh, Q, P, D)
        wts = attention_weights[:, :, :, l].transpose(0, 2, 1, 3)[..., None]  # (B,Hh,Q,P,1)
        out = out + jnp.sum(sampled * wts, axis=3)
        offset += h * w
    return out.transpose(0, 2, 1, 3).reshape(B, Q, Hh * D)
