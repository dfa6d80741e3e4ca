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
    """Zero-padded bilinear sampling, align_corners=False. -> (B, Hh, Q, P, D)

    One 2x2xD PATCH gather per sample instead of four per-corner row gathers
    (round-4 xprof: the corner gathers were ~85% of the UniPose forward at
    ~3.5 GB/s effective — 4x fewer gather ops with 4x larger contiguous
    slices is the TPU-friendly encoding). The patch start is clipped to the
    map; each corner then reselects its row/col inside the patch and applies
    its own outside-the-map zero mask, which reproduces the reference's
    zero-padding grid_sample semantics exactly (parity + gradcheck tests)."""
    B, Hh, h, w, D = value_l.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    ph, pw = min(2, h), min(2, w)
    yc = jnp.clip(y0, 0, h - ph).astype(jnp.int32)
    xc = jnp.clip(x0, 0, w - pw).astype(jnp.int32)
    sh = y0.shape  # (B, Hh, Q, P)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None, None, None], sh)
    h_idx = jnp.broadcast_to(jnp.arange(Hh)[None, :, None, None], sh)
    starts = jnp.stack(
        [b_idx.astype(jnp.int32), h_idx.astype(jnp.int32), yc, xc], axis=-1
    ).reshape(-1, 4)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0, 1),
        start_index_map=(0, 1, 2, 3),
    )
    patch = jax.lax.gather(
        value_l, starts, dnums, slice_sizes=(1, 1, ph, pw, D),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(sh + (ph, pw, D))

    # Fold the per-corner masks/weights into one (ph, pw) weight per patch
    # cell on the D-free (B, Hh, Q, P) tensors, then touch the big patch
    # tensor only ph*pw times (4 fused multiply-adds instead of 16).
    cell_w = [[0.0] * pw for _ in range(ph)]
    for i in (0, 1):
        for j in (0, 1):
            yi, xi = y0 + i, x0 + j
            inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            rs = jnp.clip(yi - yc, 0, ph - 1).astype(jnp.int32)
            cs = jnp.clip(xi - xc, 0, pw - 1).astype(jnp.int32)
            wgt = ((1 - dy) if i == 0 else dy) * ((1 - dx) if j == 0 else dx)
            for a in range(ph):
                for b in range(pw):
                    sel = ((rs == a) & (cs == b) & inside).astype(
                        value_l.dtype
                    ) * wgt.astype(value_l.dtype)
                    cell_w[a][b] = cell_w[a][b] + sel
    out = jnp.zeros(sh + (D,), value_l.dtype)
    for a in range(ph):
        for b in range(pw):
            out = out + patch[..., a, b, :] * cell_w[a][b][..., None]
    return out


# Queries per chunk of the streamed deformable-attention evaluation. The
# bilinear gather materializes 4 corner tensors of (B, Hh, q, L*P, D) — at the
# UniPose encoder's full Q = 13294 (800^2 input, bs 10) that is ~2.2 GB fp32
# PER CORNER per layer, which OOMs a 16 GB chip at compile (measured round 4).
# Chunking the query axis bounds the working set at a few hundred MB with no
# numerical change; XLA pipelines the sequential chunks. 2048 measured as fast
# as 4096 and half the memory.
Q_CHUNK = 2048


def ms_deform_attn(
    value: jnp.ndarray,  # (B, S, H_heads, D), S = sum(h_l * w_l)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(h, w)] per level
    sampling_locations: jnp.ndarray,  # (B, Q, H_heads, L, P, 2) in [0,1]
    attention_weights: jnp.ndarray,  # (B, Q, H_heads, L, P)
    q_chunk: int = None,
) -> jnp.ndarray:
    """Returns (B, Q, H_heads * D)."""
    B, S, Hh, D = value.shape
    Q = sampling_locations.shape[1]
    q_chunk = q_chunk or Q_CHUNK

    # per-level (B, Hh, h, w, D) value maps, built once per call
    maps = []
    offset = 0
    for h, w in spatial_shapes:
        v = value[:, offset : offset + h * w]  # (B, hw, Hh, D)
        maps.append(v.transpose(0, 2, 1, 3).reshape(B, Hh, h, w, D))
        offset += h * w

    def block(loc_b, wts_b):
        # loc_b: (B, q, Hh, L, P, 2); wts_b: (B, q, Hh, L, P)
        out = jnp.zeros((B, Hh, loc_b.shape[1], D), value.dtype)
        for l, v in enumerate(maps):
            loc = loc_b[:, :, :, l].transpose(0, 2, 1, 3, 4)  # (B,Hh,q,P,2)
            sampled = _bilinear_sample_level(v, loc)  # (B, Hh, q, P, D)
            wts = wts_b[:, :, :, l].transpose(0, 2, 1, 3)[..., None]
            out = out + jnp.sum(sampled * wts, axis=3)
        return out

    if Q <= q_chunk:
        out = block(sampling_locations, attention_weights)
        return out.transpose(0, 2, 1, 3).reshape(B, Q, Hh * D)

    pad = (-Q) % q_chunk
    loc_p = jnp.pad(sampling_locations, ((0, 0), (0, pad)) + ((0, 0),) * 4)
    wts_p = jnp.pad(attention_weights, ((0, 0), (0, pad)) + ((0, 0),) * 3)
    n = loc_p.shape[1] // q_chunk
    loc_c = jnp.moveaxis(
        loc_p.reshape((B, n, q_chunk) + loc_p.shape[2:]), 1, 0)
    wts_c = jnp.moveaxis(
        wts_p.reshape((B, n, q_chunk) + wts_p.shape[2:]), 1, 0)
    out = jax.lax.map(lambda ab: block(*ab), (loc_c, wts_c))
    out = jnp.moveaxis(out, 0, 1)  # (B, n, Hh, q_chunk, D) grouped on axis 1
    out = out.transpose(0, 1, 3, 2, 4).reshape(B, n * q_chunk, Hh * D)
    return out[:, :Q]
