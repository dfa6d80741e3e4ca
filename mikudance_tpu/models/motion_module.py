"""AnimateDiff-style temporal motion module, NHWC/video layout.

Rebuilds ``VanillaTemporalModule`` -> ``TemporalTransformer3DModel`` ->
``TemporalTransformerBlock`` -> ``VersatileAttention`` from
`/root/reference/src/models/motion_module.py:45,96,194,293`:

- per-spatial-location self-attention across frames: tokens laid out
  (B*H*W, T, C) — short sequences (T<=32), huge batch; exactly the layout the
  TPU wants (the T x T attention is tiny, everything else is batched matmul).
- sinusoidal temporal positional encoding (max_len 32) added to the *query
  path only*: the reference aliases the K/V tensor before applying the PE
  (`motion_module.py:404-417` — ``hidden_states_cross`` is bound before
  ``pos_encoder`` runs), a quirk that must be preserved for weight parity.
- ``proj_out`` zero-initialized so a fresh module is the identity
  (`motion_module.py:73-75`).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import (Attention, FusedGroupNorm, FusedLayerNorm,
                     GEGLUFeedForward, dense_2d, proj_dense)


def temporal_positional_encoding(max_len: int, dim: int) -> np.ndarray:
    """Standard sinusoidal PE table (max_len, dim), float32."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float64) * (-math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


class TemporalAttentionLayer(nn.Module):
    """One VersatileAttention("Temporal_Self"): PE on queries, attend over T."""

    dim: int
    heads: int
    max_len: int = 32
    use_pe: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B*HW, T, C) or (B, T, P, C) pre-normed tokens.

        The 4D layout is the module's native one — frames stay on axis 1 so
        the attention kernel reads (1, T, pb, C) tiles straight from the
        feature map with no HBM transpose."""
        T = x.shape[1]
        kv = x  # pre-PE alias, replicating motion_module.py:404-417
        if self.use_pe:
            pe = jnp.asarray(temporal_positional_encoding(self.max_len, self.dim))
            pe = pe[:T].astype(x.dtype)
            x = x + (pe[None, :, None, :] if x.ndim == 4 else pe[None, :, :])
        return Attention(self.dim, self.heads, dtype=self.dtype, name="attn")(x, kv)


class MotionModule(nn.Module):
    """Full temporal transformer applied to a (B, T, H, W, C) feature map.

    Token layout: (B, T, P=H*W, C) END TO END — the frame axis never swaps
    with the spatial axis in HBM (the (B,T,HW,C)->(B*HW,T,C) transposes of a
    naive port cost ~0.7 s/run at 768^2); the temporal attention kernel
    consumes this layout directly (kernels/temporal_attention.py:btpc).

    Frame-axis SPMD (inference sharding): when the module runs inside a
    ``shard_map`` whose mesh shards the frame axis (`frame_axis`/`frame_shards`
    set), every op here except the temporal attention is frame-local. The
    temporal section reshard is Ulysses-style: one ``all_to_all`` turns
    frames-local tokens into (spatial-sharded, all-frames) tokens, the
    attention blocks run on full sequences with full positional encodings,
    and the inverse ``all_to_all`` restores the frame sharding — numerically
    identical to the unsharded module. When the local position count does not
    divide by the shard count (tiny deep levels), fall back to all_gather +
    duplicate compute + local slice (still exact).
    """

    dim: int
    heads: int = 8
    num_transformer_blocks: int = 1
    attention_layers: int = 2
    max_len: int = 32
    use_pe: bool = True
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    frame_axis: Optional[str] = None  # mesh axis name sharding the frame dim
    frame_shards: int = 1  # size of that mesh axis (static)
    remat: bool = False  # nested remat of attention/FF sublayers (training)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        TAL = nn.remat(TemporalAttentionLayer) if self.remat else TemporalAttentionLayer
        FF = nn.remat(GEGLUFeedForward) if self.remat else GEGLUFeedForward
        B, T, H, W, C = x.shape
        residual = x
        h = x.reshape(B * T, H, W, C)
        h = FusedGroupNorm(self.norm_groups, 1e-6, dtype=self.dtype, name="norm")(h)
        h = h.reshape(B, T, H * W, C)
        h = dense_2d(proj_dense(self.dim, self.dtype, "proj_in"), h)
        # tokens stay (B, T, P, C): per-position temporal attention reads this
        # layout directly (4D path in kernels dispatch)

        sp = self.frame_shards if self.frame_axis is not None else 1
        gathered = False
        if sp > 1:
            if (H * W) % sp == 0:
                # frames-local -> position-sharded, all frames present
                h = jax.lax.all_to_all(
                    h, self.frame_axis, split_axis=2, concat_axis=1, tiled=True
                )
            else:
                gathered = True
                h = jax.lax.all_gather(h, self.frame_axis, axis=1, tiled=True)

        for b in range(self.num_transformer_blocks):
            for a in range(self.attention_layers):
                normed = FusedLayerNorm(
                    self.dim, 1e-5, dtype=self.dtype,
                    name=f"blocks_{b}_norm_{a}"
                )(h)
                h = h + TAL(
                    self.dim,
                    self.heads,
                    self.max_len,
                    self.use_pe,
                    dtype=self.dtype,
                    name=f"blocks_{b}_attn_{a}",
                )(normed)
            ff_norm = FusedLayerNorm(
                self.dim, 1e-5, dtype=self.dtype, name=f"blocks_{b}_ff_norm"
            )(h)
            h = h + FF(self.dim, dtype=self.dtype, name=f"blocks_{b}_ff")(
                ff_norm
            )

        if sp > 1:
            if gathered:
                idx = jax.lax.axis_index(self.frame_axis)
                h = jax.lax.dynamic_slice_in_dim(h, idx * T, T, axis=1)
            else:
                h = jax.lax.all_to_all(
                    h, self.frame_axis, split_axis=1, concat_axis=2, tiled=True
                )

        h = dense_2d(proj_dense(
            C, self.dtype, "proj_out", kernel_init=nn.initializers.zeros
        ), h)
        h = h.reshape(B, T, H, W, C)
        return h + residual
