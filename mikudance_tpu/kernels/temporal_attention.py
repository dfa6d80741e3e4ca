"""Fused Pallas kernel for the motion modules' temporal self-attention.

Problem shape: tokens (N, T, C) with N = B*H*W spatial positions (huge),
T <= 32 frames (tiny), C in {320, 640, 1280} with 8 heads of 40/80/160.
A dense/grouped XLA implementation materializes the (N*heads, T, T) scores in
HBM and is bandwidth-bound (~46 ms at level 0); fused in VMEM the op only
moves q, k, v, o once (~0.75 GB) — the score/softmax lives on-chip.

Layout trick: a tile packs ROWS = positions*frames (sublanes) x C (lanes).
Per head, slice the head's lane range, compute the (rows x rows) score matrix
on the MXU, apply the block-diagonal frame mask (positions are independent),
softmax in fp32 registers, and accumulate P @ V_h back into the head's lane
slice of the output tile.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _temporal_kernel(q_ref, k_ref, v_ref, o_ref, *, T: int, heads: int, scale: float):
    rows, C = q_ref.shape
    hd = C // heads

    # block-diagonal frame mask: token i belongs to position group i // T
    grp = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // T
    grp_t = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // T
    mask = grp == grp_t

    outs = []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[:, sl].astype(jnp.bfloat16)
        kh = k_ref[:, sl].astype(jnp.bfloat16)
        vh = v_ref[:, sl].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(jnp.bfloat16)
        outs.append(
            jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        )
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def temporal_attention_fused(
    q: jnp.ndarray,  # (N, T, C)
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    # 128 rows = 8 positions x 16 frames: the (rows x rows) score matmul is
    # block-diagonal with T x T blocks, so its useful fraction is T/rows —
    # smaller tiles waste 4x less MXU than 512 while M=128 still fills the
    # systolic array's output tile. HBM traffic is tile-size independent.
    rows_per_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    N, T, C = q.shape
    hd = C // heads
    scale = 1.0 / math.sqrt(hd)

    positions_per_tile = max(1, rows_per_tile // T)
    # Mosaic requires the sublane extent of a tile to be a multiple of 8
    # (unless it spans the whole array): force positions_per_tile to the
    # multiple-of-(8/gcd(T,8)) making rows = positions_per_tile * T 8-aligned.
    g = 8 // math.gcd(T, 8)
    positions_per_tile = max(g, positions_per_tile - positions_per_tile % g)
    rows = positions_per_tile * T
    pad_n = (-N) % positions_per_tile

    def flat(x):
        if pad_n:
            x = jnp.pad(x, ((0, pad_n), (0, 0), (0, 0)))
        return x.reshape(-1, C)  # (N'*T, C)

    qf, kf, vf = flat(q), flat(k), flat(v)
    total_rows = qf.shape[0]
    grid = (total_rows // rows,)

    kernel = functools.partial(_temporal_kernel, T=T, heads=heads, scale=scale)
    spec = pl.BlockSpec((rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total_rows, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * total_rows * rows * C,
            bytes_accessed=8 * total_rows * C,
            transcendentals=total_rows * rows,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    o = o.reshape(-1, T, C)
    return o[:N] if pad_n else o


def _fused_fwd(q, k, v, heads, rows_per_tile, interpret):
    return temporal_attention_fused(q, k, v, heads, rows_per_tile, interpret), (q, k, v)


def _fused_bwd(heads, rows_per_tile, interpret, res, g):
    """Backward via the XLA grouped implementation (differentiable, exact,
    and cheap at T<=32; the Pallas kernel serves the forward hot path)."""
    from .small_attention import grouped_small_attention

    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: grouped_small_attention(a, b, c, heads), q, k, v)
    return vjp(g)


temporal_attention_fused.defvjp(_fused_fwd, _fused_bwd)
