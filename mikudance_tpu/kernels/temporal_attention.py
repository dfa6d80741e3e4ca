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

    LOG2E = 1.4426950408889634
    outs = []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        # scale*log2(e) folded into the tiny (rows, hd) Q slice: the (rows,
        # rows) passes below then use single-op exp2 with no scale multiply
        qh = (q_ref[:, sl].astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
        kh = k_ref[:, sl].astype(jnp.bfloat16)
        vh = v_ref[:, sl].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
        )
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(jnp.bfloat16)
        outs.append(
            jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
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


def _temporal_kernel_btpc(q_ref, k_ref, v_ref, o_ref, *, T: int, pb: int,
                          heads: int, scale: float):
    """(1, T, pb, C) tile — the motion module's NATIVE token layout, so no
    HBM-side (B,T,HW,C)->(B*HW,T,C) transpose is ever materialized (those
    copies cost ~0.7 s/run at 768^2). Rows flatten as r = t*pb + p; two rows
    attend iff they share the spatial position: (i % pb) == (j % pb)."""
    LOG2E = 1.4426950408889634
    Tq, pbq, C = q_ref.shape[1:]
    hd = C // heads
    rows = Tq * pbq

    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    mask = (rid % pb) == (cid % pb)

    q = q_ref[0].reshape(rows, C)
    k = k_ref[0].reshape(rows, C)
    v = v_ref[0].reshape(rows, C)
    outs = []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = (q[:, sl].astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
        kh = k[:, sl].astype(jnp.bfloat16)
        vh = v[:, sl].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
        )
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(jnp.bfloat16)
        outs.append(
            jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
            )
        )
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype).reshape(Tq, pbq, C)


def temporal_attention_xla(q, k, v, heads):
    """Dense XLA twin of the (B, T, P, C) kernel (CPU / mesh-trace fallback,
    and the exact backward for the custom VJP)."""
    B, T, P, C = q.shape
    hd = C // heads
    scale = 1.0 / math.sqrt(hd)

    def split(x):
        return x.reshape(B, T, P, heads, hd)

    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("btphd,bsphd->bphts", qh, kh,
                   preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT) * scale
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bphts,bsphd->btphd", w, vh)
    return o.reshape(B, T, P, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def temporal_attention_btpc(
    q: jnp.ndarray,  # (B, T, P, C)
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    # 512 rows measured fastest at level 0 (B=2,T=16,P=9216,C=320): 10.1 ms vs
    # 20.7 ms at 128 rows — grid-step overhead beats the block-diagonal MXU
    # waste on this chip.
    rows_per_tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    B, T, P, C = q.shape
    hd = C // heads
    scale = 1.0 / math.sqrt(hd)

    # VMEM budget: 4 tiles (q/k/v/o) double-buffered plus fp32 score/softmax
    # intermediates must fit the ~16 MB scoped limit; 512 rows at C=320
    # (~330 KB/tile) is measured-fastest, wider channels scale rows down
    # proportionally (C=1280 OOMs at 512 rows).
    rows_cap = max(64, (rows_per_tile * 320) // C)
    pb = max(1, min(rows_per_tile, rows_cap) // T)
    # pb is the block's second-to-last dim -> must itself be a multiple of 8
    # (Mosaic tiling), which also makes rows = T*pb 8-aligned for any T
    pb = max(8, pb - pb % 8)
    pad_p = (-P) % pb

    def padp(x):
        if pad_p:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_p), (0, 0)))
        return x

    qf, kf, vf = padp(q), padp(k), padp(v)
    Pp = qf.shape[2]
    kernel = functools.partial(
        _temporal_kernel_btpc, T=T, pb=pb, heads=heads, scale=scale)
    spec = pl.BlockSpec((1, T, pb, C), lambda b, i: (b, 0, i, 0),
                        memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        kernel,
        grid=(B, Pp // pb),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, T, Pp, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Pp * T * (T * pb) * C,
            bytes_accessed=8 * B * T * Pp * C,
            transcendentals=B * (T * Pp) * (T * pb),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return o[:, :, :P] if pad_p else o


def _btpc_fwd(q, k, v, heads, rows_per_tile, interpret):
    return temporal_attention_btpc(q, k, v, heads, rows_per_tile, interpret), (q, k, v)


def _btpc_bwd(heads, rows_per_tile, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: temporal_attention_xla(a, b, c, heads), q, k, v)
    return vjp(g)


temporal_attention_btpc.defvjp(_btpc_fwd, _btpc_bwd)


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
