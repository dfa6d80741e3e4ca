"""Fused streaming linear (Pallas TPU) for thin token-major projections.

Infrastructure, NOT on the default model path. The motivation: the UNet's
C->C projections at Pallas/conv layout boundaries (spatial and motion
``proj_in``/``proj_out``, attention ``to_out``) get assigned TRANSPOSED
layouts by XLA (tokens-on-lanes, ``{1,2,0}`` on the (32,9216,320) level-0
activations) and lower as 40-lane-window convolutions at ~5-25 TF/s — ~10x
off the HBM bound for a memory-bound thin matmul. This kernel pins row-major
tiling on both sides, keeps the (Cin, Cout) weight VMEM-resident across the
token grid, and optionally fuses the residual add that follows every
``proj_out``.

Measured END TO END on the 768^2 denoise step, routing those projections
through it was net NEUTRAL (1144 -> 1197 ms/fwd): each replaced dot got
faster, but the transposed-layout region (anchored by the convolutions'
batch-in-sublane layout) re-materialized the same conversion cost at
neighboring ops. Same verdict as kernels/conv2d.py and layer_norm.py: XLA's
globally-chosen layouts beat piecewise Pallas pinning for this graph. Kept
as a building block (e.g. host-free head projections in the toolbox models).

Differentiable via custom VJP with an exact XLA twin backward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# weight stays VMEM-resident below this (bf16); 1280x1280 = 3.2 MB
RESIDENT_W_BYTES = 8 * 1024 * 1024


def linear_ref(x, w, b, residual=None):
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    if b is not None:
        y = y + b.astype(jnp.float32)
    y = y.astype(x.dtype)
    if residual is not None:
        y = y + residual
    return y


def _linear_kernel(x_ref, w_ref, b_ref, o_ref):
    y = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    ) + b_ref[0].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _linear_res_kernel(x_ref, w_ref, b_ref, r_ref, o_ref):
    y = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
    ) + b_ref[0].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype) + r_ref[...]


def _row_block(N: int, Cin: int, Cout: int, budget: int = 1 << 21) -> int:
    per_row = (Cin + Cout) * 2
    cap = max(8, budget // per_row)
    best = 0
    for rb in range(8, min(N, cap) + 1, 8):
        if N % rb == 0:
            best = rb
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_linear(x, w, b, residual=None, interpret: bool = False):
    """x: (..., Cin) @ w: (Cin, Cout) + b [+ residual (..., Cout)]."""
    from .flash_attention import FORCE_XLA

    on_tpu = not FORCE_XLA and jax.default_backend() == "tpu"
    Cin, Cout = w.shape
    N = 1
    for d in x.shape[:-1]:
        N *= d
    rb = _row_block(N, Cin, Cout) if N else 0
    if (not (on_tpu or interpret) or x.ndim < 2 or rb == 0
            or Cin * Cout * 2 > RESIDENT_W_BYTES):
        return linear_ref(x, w, b, residual)

    out_shape = x.shape[:-1] + (Cout,)
    x2 = x.reshape(N, Cin)
    wb = w.astype(x.dtype)
    b2 = (b if b is not None else jnp.zeros((Cout,), jnp.float32)).reshape(1, Cout)
    x_spec = pl.BlockSpec((rb, Cin), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((Cin, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((rb, Cout), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * N * Cin * Cout,
        bytes_accessed=2 * N * (Cin + Cout) + 2 * Cin * Cout,
        transcendentals=0,
    )
    if residual is not None:
        out = pl.pallas_call(
            _linear_res_kernel,
            grid=(N // rb,),
            in_specs=[x_spec, w_spec, b_spec, o_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((N, Cout), x.dtype),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
            cost_estimate=cost,
            interpret=interpret,
        )(x2, wb, b2, residual.reshape(N, Cout))
    else:
        out = pl.pallas_call(
            _linear_kernel,
            grid=(N // rb,),
            in_specs=[x_spec, w_spec, b_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((N, Cout), x.dtype),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
            cost_estimate=cost,
            interpret=interpret,
        )(x2, wb, b2)
    return out.reshape(out_shape)


def _lin_fwd(x, w, b, residual, interpret):
    return fused_linear(x, w, b, residual, interpret), (x, w, b, residual)


def _lin_bwd(interpret, res, g):
    x, w, b, residual = res
    has_b, has_r = b is not None, residual is not None

    def f(x, w, b, r):
        return linear_ref(x, w, b if has_b else None, r if has_r else None)

    b_in = b if has_b else jnp.zeros((w.shape[1],), jnp.float32)
    r_in = residual if has_r else jnp.zeros(g.shape, g.dtype)
    _, vjp = jax.vjp(f, x, w, b_in, r_in)
    dx, dw, db, dr = vjp(g)
    return dx, dw, db if has_b else None, dr if has_r else None


fused_linear.defvjp(_lin_fwd, _lin_bwd)
