"""CLIP text encoder (ViT-B/32 text tower), Flax.

UniPose embeds instance/keypoint NAMES with CLIP's text encoder
(`/root/reference/src/XPose/models/UniPose/unipose.py:122-124` loads
ViT-B/32; encodings are projected into the detector at `:332-344`).
Geometry: vocab 49408, context 77, width 512, 12 layers, 8 heads, causal
masking, EOT-token pooling through ``text_projection``.

Tokenization uses the byte-BPE vocab which isn't shipped here; pass token ids
(e.g. from ``transformers.CLIPTokenizer`` when available).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """token_ids: (B, L) int32 -> pooled text features (B, width)."""
        B, L = token_ids.shape
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok[token_ids].astype(self.dtype) + pos[None, :L].astype(self.dtype)

        causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)

        for i in range(self.layers):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"layers_{i}_ln_1")(x)
            qkv = nn.Dense(3 * self.width, dtype=self.dtype, name=f"layers_{i}_attn_in")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            hd = self.width // self.heads
            qh = q.reshape(B, L, self.heads, hd)
            kh = k.reshape(B, L, self.heads, hd)
            vh = v.reshape(B, L, self.heads, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(hd)
            logits = logits + causal[None, None].astype(logits.dtype)
            w = nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(B, L, self.width)
            x = x + nn.Dense(self.width, dtype=self.dtype, name=f"layers_{i}_attn_out")(o)

            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"layers_{i}_ln_2")(x)
            h = nn.Dense(4 * self.width, dtype=self.dtype, name=f"layers_{i}_fc")(h)
            h = h * nn.sigmoid(1.702 * h)  # quick_gelu
            x = x + nn.Dense(self.width, dtype=self.dtype, name=f"layers_{i}_proj")(h)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        # pool at the EOT token (highest id in CLIP's vocab)
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = x[jnp.arange(B), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.width),
        )
        return pooled @ proj.astype(pooled.dtype)
