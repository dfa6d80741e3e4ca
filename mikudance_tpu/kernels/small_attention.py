"""Block-diagonal grouped attention for tiny sequences (temporal attention).

The motion modules attend over T<=32 frames per spatial location
(`/root/reference/src/models/motion_module.py:404-407`): a huge batch
(B*H*W*heads) of tiny (T x head_dim) matmuls. On the 128x128 MXU a 16x40
matmul runs at ~0.5% utilization — the batched-matmul shape, not FLOPs, is
the cost.

Trick: pack G = 128//T sequences from the batch into one (G*T, head_dim)
operand and compute a single (G*T x G*T) score matrix; a block-diagonal mask
(-inf off-block) before the softmax makes the result EXACT — masked P entries
are zero, so the P@V contraction never mixes groups. MXU utilization rises
~G^2 x on Q@K^T and G x on P@V.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def grouped_small_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int, target: int = 128
) -> jnp.ndarray:
    """(B, S, C) attention for small S (= S_kv), exact, MXU-friendly."""
    B, S, C = q.shape
    hd = C // heads
    scale = 1.0 / math.sqrt(hd)
    G = max(1, target // S)

    def split(x):
        x = x.reshape(B, S, heads, hd).transpose(0, 2, 1, 3)
        return x.reshape(B * heads, S, hd)

    qh, kh, vh = split(q), split(k), split(v)
    N = B * heads
    pad = (-N) % G
    if pad:
        qh = jnp.pad(qh, ((0, pad), (0, 0), (0, 0)))
        kh = jnp.pad(kh, ((0, pad), (0, 0), (0, 0)))
        vh = jnp.pad(vh, ((0, pad), (0, 0), (0, 0)))
    M = qh.shape[0] // G

    qg = qh.reshape(M, G * S, hd)
    kg = kh.reshape(M, G * S, hd)
    vg = vh.reshape(M, G * S, hd)

    s = jnp.einsum("nid,njd->nij", qg, kg, preferred_element_type=jnp.float32)
    s = s * scale

    blk = np.arange(G * S) // S
    mask = (blk[:, None] == blk[None, :])
    s = jnp.where(jnp.asarray(mask), s, NEG_INF)

    p = jax.nn.softmax(s, axis=-1).astype(vg.dtype)
    o = jnp.einsum("nij,njd->nid", p, vg)

    o = o.reshape(M * G, S, hd)[:N]
    o = o.reshape(B, heads, S, hd).transpose(0, 2, 1, 3)
    return o.reshape(B, S, C)
