"""Pallas TPU flash attention for the UNet's spatial self-attention.

Why: at 768^2 the top UNet level runs self-attention over S=9216 tokens; a
dense implementation materializes (B*heads, S, S) logits — ~43 GB fp32 for a
16-frame CFG batch — which cannot live in HBM. This kernel streams K/V blocks
through an online-softmax accumulator so memory is O(S * head_dim).

Shape strategy (tuned to SD1.5 geometry, heads=8, head_dim in {40, 80, 160}):
- head_dim is zero-padded to 128 lanes outside the kernel (zero K columns do
  not change Q.K^T; zero V columns are sliced off after).
- grid = (batch*heads, S/q_block); K/V for one batch-head stay resident in
  VMEM (S=9216: 2.4 MB bf16 each) while the kernel walks K blocks with a
  fori_loop carrying (max, sumexp, acc) in fp32.
- Sequences not divisible by the block size (mid/low UNet levels: 576, 144
  tokens) use the dense XLA path — their logits are tiny.

The public entry ``attention`` dispatches flash/dense per shape & backend and
is installed as the global attention impl for models.layers.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import layers as _layers

LANES = 128
FORCE_XLA = False  # set True to bypass Pallas (non-TPU compile targets)
DEFAULT_Q_BLOCK = 256
DEFAULT_K_BLOCK = 512
NEG_INF = -1e30
# Softmax in base 2: fold ln(2)^-1 into the Q scaling so the hot (bq, bk)
# passes use the single-op exp2 instead of exp, and skip the explicit
# `s * scale` pass entirely (the scale rides on the tiny (bq, hd) Q slice).
LOG2E = 1.4426950408889634


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale: float):
    """Grid (BH, nq, nk): K/V blocks stream through VMEM while fp32 online-
    softmax state (running max / sumexp / accumulator) persists in scratch
    across the sequential nk dimension; the output block is written at the
    last K step."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...].astype(jnp.bfloat16)  # (bq, D)
    k = k_ref[...].astype(jnp.bfloat16)  # (bk, D)
    v = v_ref[...].astype(jnp.bfloat16)  # (bk, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
    ) * scale  # (bq, bk) fp32

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    correction = jnp.exp(m_prev - m_new)
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    )  # (bq, D)
    acc_ref[...] = acc_ref[...] * correction + pv
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[...] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_kernel_resident(q_ref, k_ref, v_ref, o_ref, *, k_block: int, scale: float):
    """Variant with the full K/V for one batch-head resident in VMEM (the
    index map keeps the same K/V block across consecutive q-block grid steps,
    so they are DMA'd once per batch-head). Preferred when they fit: the
    streaming kernel re-reads K/V for every q block."""
    q = q_ref[...].astype(jnp.bfloat16)  # (bq, D)
    bq, D = q.shape
    kv_len = k_ref.shape[0]
    n_blocks = kv_len // k_block

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, D), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(i * k_block, k_block), :].astype(jnp.bfloat16)
        v = v_ref[pl.ds(i * k_block, k_block), :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
        ) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m - m_new)
        l_new = l * correction + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
        )
        return m_new, l_new, acc * correction + pv

    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[...] = (acc / l).astype(o_ref.dtype)


# K/V for one batch-head stay VMEM-resident below this footprint (bf16, both).
RESIDENT_KV_BYTES = 6 * 1024 * 1024

# Full-C kernels: K/V with ALL heads packed in the lane dim stay resident
# below this (bf16, both, lane-padded). Pallas double-buffers inputs even for
# constant index maps, so the effective VMEM cost is ~2x this: 7 MB keeps the
# 2304-token level resident while the 9216-token top level streams K blocks.
FULLC_RESIDENT_BYTES = 7 * 1024 * 1024


def _lane_padded_bytes(S: int, C: int) -> int:
    return S * ((C + LANES - 1) // LANES) * LANES * 2


def _self_anchor(qf: jnp.ndarray, q_raw: jnp.ndarray) -> jnp.ndarray:
    """Per-row softmax offset |q|^2 * scale * log2(e) — the log2-domain score
    the row would get against K = q. Softmax is shift-invariant, so any
    per-row offset yields the EXACT same output; anchoring at the self-score
    (instead of tracking a running max online) removes the per-block max
    reduce and the l/acc rescale passes that made the kernel VPU-bound
    (80.7 -> 65.5 ms at the 768^2 level-0 shape, B=32). For the UNet's
    self-attention K row i is ``q_i (+ bank_i)``, so s_ii ~= off_i and the
    softmax denominator stays O(1): an all-underflow row would need every
    score 100+ log2-units below the self-score, impossible for bounded bank
    drift. ``_EXP_CLAMP`` guards the opposite tail."""
    return jnp.sum(qf * q_raw.astype(jnp.float32), axis=-1, keepdims=True)


# Two-sided log2-domain score clamp around the anchor. Upper side: keeps
# exp2 finite AND a full-row sum below fp32 max (exp2(100) ~ 1.3e30; 9216 of
# them ~ 1.2e34). Lower side: every entry keeps weight >= 2^-100, so the
# denominator is always > 0 — no 0/0 row even for adversarial inputs whose
# scores all sit far below the self-score (there, attention degrades
# gracefully toward uniform instead of NaN; at ratios beyond 2^100 the
# difference from exact softmax is below bf16 resolution anyway).
_EXP_CLAMP = 100.0


def _flash_kernel_fullc_resident(q_ref, k_ref, v_ref, o_ref, *, heads: int,
                                 k_block: int, scale: float, fuse_ones: bool):
    """All heads packed in the lane dim (C = heads*hd). Each head's lane range
    is sliced in VMEM — no HBM-side head split / pad-to-128 materialization
    (which cost ~2.4 s/run in pad + data-formatting fusions at 768^2). K/V for
    one batch element stay resident across consecutive q blocks.

    With ``fuse_ones`` (see ``_augment_v``), v_ref carries hd+1 lanes per
    head, the extra lane all-ones: P.V and rowsum(P) come out of ONE MXU
    pass, removing the per-block lane-reduction for the softmax denominator
    from the VPU. Softmax stability comes from the self-score anchor
    (``_self_anchor``) instead of an online running max, so the hot (qb, bk)
    path is one subtract-min + one exp2 + one bf16 convert per element."""
    qb, C = q_ref.shape[1:]
    hd = C // heads
    hv = hd + 1 if fuse_ones else hd
    kv_len = k_ref.shape[1]
    n_blocks = kv_len // k_block

    for h in range(heads):
        lo = h * hd
        lov = h * hv
        qf = q_ref[0, :, lo : lo + hd].astype(jnp.float32) * (scale * LOG2E)
        off = _self_anchor(qf, q_ref[0, :, lo : lo + hd])
        qh = qf.astype(jnp.bfloat16)
        l0 = jnp.zeros((qb, 1), jnp.float32)
        acc0 = jnp.zeros((qb, hd), jnp.float32)

        def body(j, carry, lo=lo, lov=lov, qh=qh, off=off):
            l, acc = carry
            kh = k_ref[0, pl.ds(j * k_block, k_block), lo : lo + hd].astype(jnp.bfloat16)
            vh = v_ref[0, pl.ds(j * k_block, k_block), lov : lov + hv].astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
            )  # log2-domain scores: scale*log2(e) folded into q
            p = jnp.exp2(jnp.clip(s - off, -_EXP_CLAMP, _EXP_CLAMP)).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
            )  # fused: (qb, hd+1), last column = rowsum(p)
            if fuse_ones:
                l_new = l + pv[:, hd:]
            else:
                l_new = l + jnp.sum(
                    p.astype(jnp.float32), axis=-1, keepdims=True)
            return l_new, acc + pv[:, :hd]

        l, acc = jax.lax.fori_loop(0, n_blocks, body, (l0, acc0))
        o_ref[0, :, lo : lo + hd] = (acc / l).astype(o_ref.dtype)


def _flash_kernel_fullc_stream(q_ref, k_ref, v_ref, o_ref, l_ref, acc_ref,
                               *, heads: int, scale: float, fuse_ones: bool):
    """Streaming full-C variant (K/V too big for VMEM residency): grid walks
    K blocks sequentially; fp32 softmax state per head persists in scratch
    (l holds one lane column per head). Stability via the self-score anchor
    (``_self_anchor``) — no online max, no rescale passes."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    qb, C = q_ref.shape[1:]
    hd = C // heads

    @pl.when(j == 0)
    def _init():
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    hv = hd + 1 if fuse_ones else hd
    for h in range(heads):
        lo = h * hd
        lov = h * hv
        qf = q_ref[0, :, lo : lo + hd].astype(jnp.float32) * (scale * LOG2E)
        off = _self_anchor(qf, q_ref[0, :, lo : lo + hd])
        qh = qf.astype(jnp.bfloat16)
        kh = k_ref[0, :, lo : lo + hd].astype(jnp.bfloat16)
        vh = v_ref[0, :, lov : lov + hv].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
        )  # log2-domain scores
        p = jnp.exp2(jnp.clip(s - off, -_EXP_CLAMP, _EXP_CLAMP)).astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
        )  # fused: (qb, hd+1), last column = rowsum(p) from the same MXU pass
        if fuse_ones:
            l_new = l_ref[:, h : h + 1] + pv[:, hd:]
        else:
            l_new = l_ref[:, h : h + 1] + jnp.sum(
                p.astype(jnp.float32), axis=-1, keepdims=True)
        acc_ref[:, lo : lo + hd] = acc_ref[:, lo : lo + hd] + pv[:, :hd]
        l_ref[:, h : h + 1] = l_new

    @pl.when(j == nk - 1)
    def _finalize():
        for h in range(heads):
            lo = h * hd
            o_ref[0, :, lo : lo + hd] = (
                acc_ref[:, lo : lo + hd] / l_ref[:, h : h + 1]
            ).astype(o_ref.dtype)


def _augment_v(v: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(B, S, heads*hd) -> (B, S, heads*(hd+1)) with an all-ones lane appended
    to each head's slice, so the kernels' P.V matmul also emits rowsum(P) (the
    softmax denominator) from the same MXU pass. hd+1 stays far under the
    128-lane tile, so the extra lane is MXU-free."""
    B, S, C = v.shape
    hd = C // heads
    vh = v.reshape(B, S, heads, hd)
    ones = jnp.ones((B, S, heads, 1), v.dtype)
    return jnp.concatenate([vh, ones], axis=-1).reshape(B, S, heads * (hd + 1))


def _can_fuse_ones(C: int, heads: int) -> bool:
    """Fuse rowsum(P) into P.V only when the +1 lane per head does not grow
    V's padded lane footprint (hd=40: 320->328 both pad to 384 — free; hd=80:
    640->648 pads to 768 and pushed the level-1 resident kernel over VMEM)."""
    return -C % LANES >= heads


def flash_attention_fullc(
    q: jnp.ndarray,  # (B, S, C), heads packed in C
    k: jnp.ndarray,  # (B, Skv, C)
    v: jnp.ndarray,  # (B, Skv, C)
    heads: int,
    scale: float,
    q_block: int = DEFAULT_Q_BLOCK,
    k_block: int = DEFAULT_K_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, C = q.shape
    Skv = k.shape[1]
    assert S % q_block == 0 and Skv % k_block == 0
    fuse_ones = _can_fuse_ones(C, heads)
    if fuse_ones:
        v = _augment_v(v, heads)
    Cv = v.shape[-1]

    if _lane_padded_bytes(Skv, C) + _lane_padded_bytes(Skv, Cv) <= FULLC_RESIDENT_BYTES:
        kernel = functools.partial(
            _flash_kernel_fullc_resident, heads=heads, k_block=k_block, scale=scale,
            fuse_ones=fuse_ones)
        return pl.pallas_call(
            kernel,
            grid=(B, S // q_block),
            in_specs=[
                pl.BlockSpec((1, q_block, C), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Skv, C), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Skv, Cv), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, q_block, C), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S, C), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * S * Skv * C,
                bytes_accessed=2 * B * (2 * S + 2 * Skv) * C,
                transcendentals=B * heads * S * Skv,
            ),
            interpret=interpret,
        )(q, k, v)

    kernel = functools.partial(
        _flash_kernel_fullc_stream, heads=heads, scale=scale, fuse_ones=fuse_ones)
    return pl.pallas_call(
        kernel,
        grid=(B, S // q_block, Skv // k_block),
        in_specs=[
            pl.BlockSpec((1, q_block, C), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_block, C), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_block, Cv), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, C), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((q_block, LANES), jnp.float32),  # per-head sumexp
            pltpu.VMEM((q_block, C), jnp.float32),  # packed accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * Skv * C,
            bytes_accessed=2 * B * (S * C + 2 * Skv * C * (S // q_block)),
            transcendentals=B * heads * S * Skv,
        ),
        interpret=interpret,
    )(q, k, v)


def _flash_kernel_fullc_t(qt_ref, k_ref, vt_ref, ot_ref, *, heads: int,
                          hd: int, k_block: int, scale: float):
    """Transposed-PV resident kernel with the anchor folded into the QK
    matmul — the fast path for the 9216-token top level.

    Two MXU inefficiencies of the non-transposed kernels disappear here:

    - PV: ``pv_t = V^T @ P^T`` has output lanes = q_block (256, full 128-lane
      tiles) and contraction = k_block (512, full) instead of the (qb, hd+1)
      = 41-lane output of ``P @ V`` (~32% MXU).
    - the softmax anchor subtraction rides the QK matmul: q gets a ``-off``
      row and K an all-ones lane (both land in padding, zero extra MXU
      passes), so the hot per-element chain is clip+exp2+convert only. The
      bf16 rounding of ``off`` is a per-q-row CONSTANT factor on p that
      cancels exactly in the final ``acc / l`` division.

    Layouts: qt/ot are (B, C, S) — head h occupies sublane rows
    [h*hd, (h+1)*hd); K is (B, S, heads*(hd+8)) lane-augmented (per head:
    hd lanes of K, one ones lane, 7 zero lanes); vt is (B, heads*(hd+8), S)
    row-augmented the same way (the ones row turns P.V into the softmax
    denominator — in sublanes, so it is free for EVERY head_dim, unlike the
    lane-side ``_augment_v`` which only fits when padding allows)."""
    hk = hd + 8
    kv_len = k_ref.shape[1]
    n_blocks = kv_len // k_block

    for h in range(heads):
        lo = h * hd
        lok = h * hk
        q_raw = qt_ref[0, lo : lo + hd, :]              # (hd, qb)
        qf = q_raw.astype(jnp.float32) * (scale * LOG2E)
        off = jnp.sum(qf * q_raw.astype(jnp.float32), axis=0, keepdims=True)
        qb_n = qf.shape[1]
        qh_aug = jnp.concatenate([
            qf.astype(jnp.bfloat16),
            (-off).astype(jnp.bfloat16),
            jnp.zeros((hk - hd - 1, qb_n), jnp.bfloat16),
        ], axis=0)  # (hk, qb)

        l0 = jnp.zeros((8, qb_n), jnp.float32)
        acc0 = jnp.zeros((hd, qb_n), jnp.float32)

        def body(j, carry, lok=lok, qh_aug=qh_aug):
            l, acc = carry
            kh = k_ref[0, pl.ds(j * k_block, k_block), lok : lok + hk]
            vh = vt_ref[0, lok : lok + hk, pl.ds(j * k_block, k_block)]
            s_t = jax.lax.dot_general(
                kh.astype(jnp.bfloat16), qh_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
            )  # (bk, qb): s - off in the log2 domain
            # two-sided clamp, same role as in the other kernels: the lower
            # side keeps every weight >= 2^-100 so the denominator can never
            # flush to zero (q/k come from DIFFERENT projections, so the
            # anchor does not strictly bound a row's best score)
            p_t = jnp.exp2(jnp.clip(s_t, -_EXP_CLAMP, _EXP_CLAMP)).astype(jnp.bfloat16)
            pv_t = jax.lax.dot_general(
                vh.astype(jnp.bfloat16), p_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
            )  # (hk, qb): rows :hd = V^T P^T, row hd = colsum(P^T)
            return l + pv_t[hd : hd + 8], acc + pv_t[:hd]

        l, acc = jax.lax.fori_loop(0, n_blocks, body, (l0, acc0))
        ot_ref[0, lo : lo + hd, :] = (acc / l[:1]).astype(ot_ref.dtype)


def _aug_heads(x: jnp.ndarray, heads: int, hd: int, axis_rows: bool):
    """(B, S, heads*hd) -> augmented per-head layout with a ones slot and 7
    zero slots. axis_rows=False: lane-augmented (B, S, heads*(hd+8)).
    axis_rows=True: transposed row-augmented (B, heads*(hd+8), S)."""
    B, S, _ = x.shape
    x4 = x.reshape(B, S, heads, hd)
    ones = jnp.ones((B, S, heads, 1), x.dtype)
    zeros = jnp.zeros((B, S, heads, 7), x.dtype)
    aug = jnp.concatenate([x4, ones, zeros], axis=3)  # (B, S, heads, hd+8)
    if axis_rows:
        return aug.transpose(0, 2, 3, 1).reshape(B, heads * (hd + 8), S)
    return aug.reshape(B, S, heads * (hd + 8))


def flash_attention_fullc_t(
    q: jnp.ndarray,  # (B, S, C), heads packed in C
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: float,
    q_block: int = DEFAULT_Q_BLOCK,
    k_block: int = DEFAULT_K_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, C = q.shape
    Skv = k.shape[1]
    hd = C // heads
    hk = hd + 8
    assert S % q_block == 0 and Skv % k_block == 0
    qt = jnp.swapaxes(q, 1, 2)  # (B, C, S)
    kt = _aug_heads(k, heads, hd, axis_rows=False)  # (B, Skv, heads*hk)
    vt = _aug_heads(v, heads, hd, axis_rows=True)   # (B, heads*hk, Skv)

    kernel = functools.partial(
        _flash_kernel_fullc_t, heads=heads, hd=hd, k_block=k_block, scale=scale)
    ot = pl.pallas_call(
        kernel,
        grid=(B, S // q_block),
        in_specs=[
            pl.BlockSpec((1, C, q_block), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Skv, heads * hk), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads * hk, Skv), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, q_block), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, S), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * Skv * C,
            bytes_accessed=2 * B * (2 * S + 2 * Skv) * C,
            transcendentals=B * heads * S * Skv,
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return jnp.swapaxes(ot, 1, 2)


def _flash_kernel_fullc_nt(q_ref, k_ref, v_ref, o_ref, *, heads: int,
                           hd: int, k_block: int, scale: float):
    """Layout-NEUTRAL variant of the transposed-PV kernel: all refs are
    standard (B, S, C) row-major; every transposition happens inside the
    MXU via ``dot_general`` dimension numbers instead of HBM-side
    ``swapaxes``/augment copies.

    Why this exists: ``_flash_kernel_fullc_t`` takes pre-transposed
    (B, C, S) operands, so its boundary ``swapaxes`` invite XLA to
    propagate token-minor layouts through the surrounding LayerNorms and
    Dense projections — the 9-TF/s "transposed projection dots" / layout
    copies that cost ~100+ ms/step at 768^2 (xprof round 3). Here:

    - QK: ``s_t = K_aug @ Q_aug^T`` (contract the lane dim of both) — the
      rhs transpose is MXU-native; K's ones LANE x Q's ``-off`` lane folds
      the softmax anchor in, exactly as in the _t kernel.
    - PV: ``pv_t = V_aug^T @ P_t`` (contract the sublane dim of both) —
      output lanes = q_block (full tiles), the _t kernel's PV win, with V
      consumed in its standard (bk, hd) orientation; V's ones lane becomes
      the denominator row of the output.
    - The only explicit transpose is the (hd, qb) -> (qb, hd) accumulator
      flip at the very end of each (head, q-block): a tiny fp32 tile.
    """
    qb = q_ref.shape[1]
    kv_len = k_ref.shape[1]
    n_blocks = kv_len // k_block

    for h in range(heads):
        lo = h * hd
        q_raw = q_ref[0, :, lo : lo + hd]               # (qb, hd)
        qf = q_raw.astype(jnp.float32) * (scale * LOG2E)
        off = jnp.sum(qf * q_raw.astype(jnp.float32), axis=-1, keepdims=True)
        q_aug = jnp.concatenate(
            [qf.astype(jnp.bfloat16), (-off).astype(jnp.bfloat16)], axis=1
        )  # (qb, hd+1)

        l0 = jnp.zeros((1, qb), jnp.float32)
        acc0 = jnp.zeros((hd, qb), jnp.float32)

        def body(j, carry, lo=lo, q_aug=q_aug):
            l, acc = carry
            kh = k_ref[0, pl.ds(j * k_block, k_block), lo : lo + hd].astype(jnp.bfloat16)
            vh = v_ref[0, pl.ds(j * k_block, k_block), lo : lo + hd].astype(jnp.bfloat16)
            ones = jnp.ones((k_block, 1), jnp.bfloat16)
            k_aug = jnp.concatenate([kh, ones], axis=1)  # (bk, hd+1)
            s_t = jax.lax.dot_general(
                k_aug, q_aug, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
            )  # (bk, qb) = (s - off) in the log2 domain
            p_t = jnp.exp2(jnp.clip(s_t, -_EXP_CLAMP, _EXP_CLAMP)).astype(jnp.bfloat16)
            v_aug = jnp.concatenate([vh, ones], axis=1)  # (bk, hd+1)
            pv_t = jax.lax.dot_general(
                v_aug, p_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
            )  # (hd+1, qb): rows :hd = V^T P^T, row hd = colsum(P^T)
            return l + pv_t[hd : hd + 1], acc + pv_t[:hd]

        l, acc = jax.lax.fori_loop(0, n_blocks, body, (l0, acc0))
        o_ref[0, :, lo : lo + hd] = (acc / l).T.astype(o_ref.dtype)


def flash_attention_fullc_nt(
    q: jnp.ndarray,  # (B, S, C), heads packed in C — standard layout
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: float,
    q_block: int = DEFAULT_Q_BLOCK,
    k_block: int = DEFAULT_K_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, C = q.shape
    Skv = k.shape[1]
    hd = C // heads
    assert S % q_block == 0 and Skv % k_block == 0

    kernel = functools.partial(
        _flash_kernel_fullc_nt, heads=heads, hd=hd, k_block=k_block, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B, S // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Skv, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Skv, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * Skv * C,
            bytes_accessed=2 * B * (2 * S + 2 * Skv) * C,
            transcendentals=B * heads * S * Skv,
        ),
        interpret=interpret,
    )(q, k, v)


# Route the big streamed-regime self-attention (the top-level 9216-token
# shape) through the transposed kernel. Module flag so probes can A/B it.
TRANSPOSED_FULLC = True
# Prefer the layout-neutral variant of the transposed kernel (standard
# (B, S, C) interface, in-MXU transposition) over the HBM-transposed one.
NEUTRAL_FULLC = True


def _cross_kernel_fullc(q_ref, k_ref, v_ref, o_ref, *, heads: int,
                        kv_len: int, scale: float):
    """Cross-attention over a SHORT key/value sequence (CLIP context, 257
    tokens): K/V stay VMEM-resident across the whole grid; softmax is
    single-shot (no online accumulation). Replaces the dense XLA path that
    materialized (B, heads, S, 257) fp32 score tensors in HBM (~2.4 GB at
    768^2 level 0 and ~20 ms/step in softmax fusions alone)."""
    qb, C = q_ref.shape[1:]
    hd = C // heads
    kvp = k_ref.shape[1]

    key_id = jax.lax.broadcasted_iota(jnp.int32, (qb, kvp), 1)
    pad_mask = key_id < kv_len

    for h in range(heads):
        lo = h * hd
        qh = (q_ref[0, :, lo : lo + hd].astype(jnp.float32)
              * (scale * LOG2E)).astype(jnp.bfloat16)
        kh = k_ref[0, :, lo : lo + hd].astype(jnp.bfloat16)
        vh = v_ref[0, :, lo : lo + hd].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
        )
        s = jnp.where(pad_mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(jnp.bfloat16)
        o_ref[0, :, lo : lo + hd] = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT
        ).astype(o_ref.dtype)


def flash_attention_cross(
    q: jnp.ndarray,  # (B, S, C), heads packed in C
    k: jnp.ndarray,  # (B, Skv, C), Skv small (<= ~512)
    v: jnp.ndarray,
    heads: int,
    scale: float,
    q_block: int = DEFAULT_Q_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, C = q.shape
    kv_len = k.shape[1]
    assert S % q_block == 0
    pad = (-kv_len) % 8  # sublane alignment
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    kvp = k.shape[1]

    kernel = functools.partial(
        _cross_kernel_fullc, heads=heads, kv_len=kv_len, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B, S // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvp, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvp, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * kvp * C,
            bytes_accessed=2 * B * (2 * S + 2 * kvp) * C,
            transcendentals=B * heads * S * kvp,
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention_padded(
    q: jnp.ndarray,  # (BH, S, D), D a lane multiple
    k: jnp.ndarray,  # (BH, Skv, D)
    v: jnp.ndarray,  # (BH, Skv, D)
    scale: float,
    q_block: int = DEFAULT_Q_BLOCK,
    k_block: int = DEFAULT_K_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    BH, S, D = q.shape
    Skv = k.shape[1]
    assert D % LANES == 0 and S % q_block == 0 and Skv % k_block == 0

    if 2 * Skv * D * 2 <= RESIDENT_KV_BYTES:
        kernel = functools.partial(_flash_kernel_resident, k_block=k_block, scale=scale)
        return pl.pallas_call(
            kernel,
            grid=(BH, S // q_block),
            in_specs=[
                pl.BlockSpec((None, q_block, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, Skv, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, Skv, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, q_block, D), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BH, S, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * BH * S * Skv * D,
                bytes_accessed=2 * BH * (2 * S + 2 * Skv) * D,
                transcendentals=BH * S * Skv,
            ),
            interpret=interpret,
        )(q, k, v)

    kernel = functools.partial(_flash_kernel, scale=scale)
    grid = (BH, S // q_block, Skv // k_block)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, q_block, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k_block, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k_block, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, q_block, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((q_block, LANES), jnp.float32),  # running max
            pltpu.VMEM((q_block, LANES), jnp.float32),  # running sumexp
            pltpu.VMEM((q_block, D), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * S * Skv * D,
            bytes_accessed=2 * BH * (S * D + 2 * Skv * D * (S // q_block)),
            transcendentals=BH * S * Skv,
        ),
        interpret=interpret,
    )(q, k, v)


def _split_heads(x, B, s, heads, hd, D):
    x = x.reshape(B, s, heads, hd).transpose(0, 2, 1, 3)
    x = x.reshape(B * heads, s, hd)
    if hd < D:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, D - hd)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, heads, q_block, k_block, interpret):
    B, S, C = q.shape
    Skv = k.shape[1]
    hd = C // heads
    scale = 1.0 / math.sqrt(hd)
    if Skv != S and Skv <= 512:
        # short-KV cross-attention (CLIP context): resident K/V, one-shot softmax
        return flash_attention_cross(
            q, k, v, heads, scale, q_block=q_block, interpret=interpret
        )
    if hd % LANES != 0:
        # heads stay packed in the lane dim; the kernel slices each head's
        # lane range in VMEM (hd in {40, 80}: zero-padding each head to 128
        # lanes would materialize ~3x the tensor bytes in HBM first)
        Cv = C + heads if _can_fuse_ones(C, heads) else C
        resident_old = (_lane_padded_bytes(Skv, C) + _lane_padded_bytes(Skv, Cv)
                        <= FULLC_RESIDENT_BYTES)
        if (NEUTRAL_FULLC and TRANSPOSED_FULLC
                and S % q_block == 0 and Skv % k_block == 0):
            # layout-neutral transposed-PV kernel (standard (B, S, C)
            # boundary, transposition inside the MXU via dot_general
            # dimension numbers): full-lane PV output at EVERY level, no
            # HBM-side swapaxes/augment copies, bit-identical to the _t
            # kernel. Covers both the resident (2304) and streamed (9216)
            # regimes — K/V stay VMEM-resident under the raised cap.
            return flash_attention_fullc_nt(
                q, k, v, heads, scale, q_block=q_block, k_block=k_block,
                interpret=interpret,
            )
        if (TRANSPOSED_FULLC and not resident_old
                and S % q_block == 0 and Skv % k_block == 0):
            # the streamed regime (top 9216-token level): the transposed
            # kernel keeps augmented K/V resident under a raised VMEM cap
            # and runs PV at full lane width (see _flash_kernel_fullc_t)
            return flash_attention_fullc_t(
                q, k, v, heads, scale, q_block=q_block, k_block=k_block,
                interpret=interpret,
            )
        return flash_attention_fullc(
            q, k, v, heads, scale, q_block=q_block, k_block=k_block,
            interpret=interpret,
        )
    # lane-aligned head_dim (128/256): the classic head-split layout is free
    o = flash_attention_padded(
        _split_heads(q, B, S, heads, hd, hd),
        _split_heads(k, B, Skv, heads, hd, hd),
        _split_heads(v, B, Skv, heads, hd, hd),
        scale, q_block=q_block, k_block=k_block, interpret=interpret,
    )
    o = o.reshape(B, heads, S, hd).transpose(0, 2, 1, 3)
    return o.reshape(B, S, C)


def _flash_fwd(q, k, v, heads, q_block, k_block, interpret):
    return _flash(q, k, v, heads, q_block, k_block, interpret), (q, k, v)


def _bwd_chunk(S: int) -> int:
    """Backward recompute chunk: independent of the forward q_block. Smaller
    chunks bound the fp32 (B, H, chunk, S) score buffers inside the scan body
    (432x5184 chunks held 1.35 GB x2 during stage-2 training)."""
    return _largest_divisor(S, 160, 16) or S


def _flash_bwd(heads, q_block, k_block, interpret, res, g):
    """Chunked-dense backward: recompute P per query block so peak memory is
    O(chunk * S) instead of O(S^2). Runs as plain XLA (one scan program);
    q/k/v stay bf16, every contraction accumulates in fp32."""
    q, k, v = res
    B, S, C = q.shape
    Skv = k.shape[1]
    hd = C // heads
    scale = 1.0 / math.sqrt(hd)
    q_block = _bwd_chunk(S)

    def heads_first(x, s):
        return x.reshape(B, s, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads_first(q, S), heads_first(k, Skv), heads_first(v, Skv)
    gh = heads_first(g, S)
    n_chunks = S // q_block
    qc = qh.reshape(B, heads, n_chunks, q_block, hd).transpose(2, 0, 1, 3, 4)
    gc = gh.reshape(B, heads, n_chunks, q_block, hd).transpose(2, 0, 1, 3, 4)

    f32 = jnp.float32

    def body(carry, qg):
        dk, dv = carry
        q_blk, g_blk = qg  # (B, H, bq, hd) bf16
        s = jnp.einsum("bhqd,bhkd->bhqk", q_blk, kh,
                       preferred_element_type=f32) * scale
        p = jax.nn.softmax(s, axis=-1)
        pl_ = p.astype(q.dtype)
        dv = dv + jnp.einsum("bhqk,bhqd->bhkd", pl_, g_blk,
                             preferred_element_type=f32)
        dp = jnp.einsum("bhqd,bhkd->bhqk", g_blk, vh,
                        preferred_element_type=f32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_l = ds.astype(q.dtype)
        dq_blk = jnp.einsum("bhqk,bhkd->bhqd", ds_l, kh,
                            preferred_element_type=f32) * scale
        dk = dk + jnp.einsum("bhqk,bhqd->bhkd", ds_l, q_blk,
                             preferred_element_type=f32) * scale
        return (dk, dv), dq_blk

    zeros = jnp.zeros((B, heads, Skv, hd), jnp.float32)
    (dk, dv), dq_chunks = jax.lax.scan(body, (zeros, zeros), (qc, gc))

    def merge(x, s):
        return x.transpose(0, 2, 1, 3).reshape(B, s, C)

    dq = merge(
        dq_chunks.transpose(1, 2, 0, 3, 4).reshape(B, heads, S, hd), S
    ).astype(q.dtype)
    return dq, merge(dk, Skv).astype(k.dtype), merge(dv, Skv).astype(v.dtype)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int,
    q_block: int = DEFAULT_Q_BLOCK, k_block: int = DEFAULT_K_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head attention on (B, S, C) tensors via the Pallas kernel;
    differentiable via a memory-bounded chunked backward."""
    return _flash(q, k, v, heads, q_block, k_block, interpret)


def _largest_divisor(S: int, cap: int, mult: int):
    """Largest divisor of S that is <= cap and a multiple of `mult`."""
    for b in range(min(cap, S) - min(cap, S) % mult, mult - 1, -mult):
        if S % b == 0:
            return b
    return None


# Measured-fastest (q_block, k_block) per sequence length on the real chip
# (sweep at B=32, heads=8): 9216 tokens 85ms @ (512,1024) vs 110ms @ (256,1024);
# 2304 tokens 9.5ms @ (384,768) vs 13ms @ (256,576). Larger blocks fail VMEM.
TUNED_BLOCKS = {
    9216: (512, 1024),  # 768^2 level-0 (stream path)
    2304: (384, 768),  # 768^2 level-1 (resident path)
}


def pick_blocks(S: int):
    """(q_block, k_block) dividing S. Tuned table first, then the 128-ladder
    heuristic; fall back to any 16-multiple divisors (bf16 sublane tiling) so
    non-128-aligned sequences (e.g. 576^2 training: 5184 = 40.5*128) still
    run flash."""
    if S in TUNED_BLOCKS:
        return TUNED_BLOCKS[S]
    q_block = next((b for b in (512, 256, 128) if S % b == 0), None)
    k_block = next((b for b in (1024, 512, 256, 128) if S % b == 0), None)
    if q_block is None:
        q_block = _largest_divisor(S, 512, 16)
    if k_block is None:
        k_block = _largest_divisor(S, 1024, 16)
    return q_block, k_block


def _use_flash(S_q: int, S_kv: int) -> bool:
    if S_q != S_kv or S_q < 1024:
        return False
    qb, kb = pick_blocks(S_q)
    return qb is not None and kb is not None and qb >= 64


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Dispatching attention: Pallas flash on TPU for long self-attention;
    block-diagonal grouped matmuls for tiny temporal sequences (<=32 frames);
    dense XLA otherwise (cross-attention over 257 CLIP tokens and the
    576/144-token UNet levels)."""
    from .small_attention import grouped_small_attention
    from .temporal_attention import (
        temporal_attention_btpc,
        temporal_attention_fused,
        temporal_attention_xla,
    )

    # FORCE_XLA routes around the Pallas kernels — used when tracing for a
    # non-default backend (e.g. the virtual CPU mesh while the axon TPU is the
    # default backend, where jax.default_backend() misleads the dispatch).
    on_tpu = (not FORCE_XLA) and jax.default_backend() == "tpu"
    if q.ndim == 4:
        # (B, T, P, C): per-position attention across frames in the motion
        # module's native layout (no transpose ever hits HBM)
        if on_tpu:
            return temporal_attention_btpc(q, k, v, heads)
        return temporal_attention_xla(q, k, v, heads)
    S_q, S_kv = q.shape[1], k.shape[1]
    if S_q == S_kv and S_q <= 32 and q.shape[0] >= 64:
        if on_tpu:
            return temporal_attention_fused(q, k, v, heads)
        return grouped_small_attention(q, k, v, heads)
    if on_tpu and _use_flash(S_q, S_kv):
        qb, kb = pick_blocks(S_q)
        return flash_attention(q, k, v, heads, q_block=qb, k_block=kb)
    if on_tpu and S_q >= 1024 and S_kv != S_q and S_kv <= 512:
        qb, kb = pick_blocks(S_q)
        if qb is not None and qb >= 64:
            return flash_attention(q, k, v, heads, q_block=qb, k_block=kb)
    return _layers.dot_product_attention(q, k, v, heads)


def install() -> None:
    """Route models.layers attention through this dispatcher."""
    _layers.set_attention_impl(attention)
