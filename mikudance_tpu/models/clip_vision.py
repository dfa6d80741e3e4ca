"""CLIP ViT-L/14 vision tower with projection, Flax.

Rebuilds the ``CLIPVisionModelWithProjection`` image encoder of
sd-image-variations as used by the reference pipeline
(`/root/reference/src/pipelines/pipeline_mikudance.py:405-417`): the image
prompt is the FULL 257-token sequence — ``last_hidden_state`` →
``post_layernorm`` → ``visual_projection`` → (B, 257, 768) — not the pooled
class token.

Also provides the CLIPImageProcessor-equivalent preprocessing constants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.configs import CLIPVisionConfig
from .layers import run_attention

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        # CLIP attention: q/k/v/out all with bias
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(h)
        attn = run_attention(q, k, v, c.num_heads)
        x = x + nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(attn)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """Returns the projected full token sequence (B, 1+N_patches, projection_dim)."""

    cfg: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: (B, 224, 224, 3), already CLIP-normalized, NHWC."""
        c = self.cfg
        B = pixel_values.shape[0]
        n_pos = (c.image_size // c.patch_size) ** 2 + 1

        patches = nn.Conv(
            c.hidden_size,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(B, -1, c.hidden_size)

        class_emb = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        ).astype(self.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(class_emb, (B, 1, c.hidden_size)), patches], axis=1
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (n_pos, c.hidden_size)
        ).astype(self.dtype)
        x = x + pos[None]

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="pre_layrnorm")(x)
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c, self.dtype, name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="post_layernorm")(x)
        return nn.Dense(
            c.projection_dim, use_bias=False, dtype=self.dtype, name="visual_projection"
        )(x)
