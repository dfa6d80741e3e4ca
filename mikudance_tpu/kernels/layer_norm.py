"""Fused row LayerNorm (Pallas TPU) with row-major input AND output.

Infrastructure, NOT on the default model path. The motivation was layout:
XLA lowers the transformer-block LayerNorms to `convert_reduce` fusions whose
outputs it lays out TRANSPOSED (channels on sublanes, `{2,3,1,0}` on the
(2,16,9216,320) level-0 activations), dragging downstream dots into
40-lane-window matmuls at ~10-70 TF/s. This kernel pins row-major tiling on
both sides and normalizes at streaming bandwidth (one read + one write).

Measured END TO END on the 768^2 denoise step, however, routing the
transformer/motion LayerNorms through it was net NEUTRAL-to-NEGATIVE
(1144 -> 1194 ms/fwd): the dots touching LN outputs sped up (ff/out
61 -> 13 ms), but XLA re-inserted equivalent transpose cost at the new
Pallas boundaries elsewhere (whack-a-mole — the transposed-layout region is
anchored by the convolutions' batch-in-sublane layout, which Pallas LN alone
cannot flip). Kept as a building block for layouts where the trade-off
differs; see also kernels/conv2d.py's NOTE for the same phenomenon.

Semantics match ``flax.linen.LayerNorm`` over the last axis: fp32 stats,
affine scale/bias, output cast to the input dtype. Differentiable via a
custom VJP whose backward runs the exact XLA twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Route the transformer/motion LayerNorms through the Pallas kernel (see
# models/layers.py::FusedLayerNorm). Off by default historically (piecewise
# routing was layout whack-a-mole, see the module docstring); flipped by the
# whole-loop row-major experiment together with conv2d/group_norm.
PREFER_PALLAS = False


def layer_norm_ref(x, scale, bias, eps: float):
    """XLA reference twin (non-TPU path and the exact backward)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)  # (rb, C)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _row_block(N: int, C: int, budget: int = 1 << 20) -> int:
    """Largest divisor of N (multiple of 8 sublanes) whose (rb, C) bf16 block
    fits the budget."""
    cap = max(8, budget // (C * 2))
    best = 0
    for rb in range(8, min(N, cap) + 1, 8):
        if N % rb == 0:
            best = rb
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, scale, bias, eps: float = 1e-5, interpret: bool = False):
    """LayerNorm over the last axis of x (any leading shape); Pallas on TPU."""
    from .flash_attention import FORCE_XLA

    on_tpu = not FORCE_XLA and jax.default_backend() == "tpu"
    C = x.shape[-1]
    N = 1
    for d in x.shape[:-1]:
        N *= d
    rb = _row_block(N, C) if N else 0
    if not (on_tpu or interpret) or x.ndim < 2 or rb == 0:
        return layer_norm_ref(x, scale, bias, eps)

    x2 = x.reshape(N, C)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(N // rb,),
        in_specs=[
            pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * N * C,
            bytes_accessed=4 * N * C,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, scale.reshape(1, C), bias.reshape(1, C))
    return out.reshape(x.shape)


def _ln_fwd(x, scale, bias, eps, interpret):
    return fused_layer_norm(x, scale, bias, eps, interpret), (x, scale, bias)


def _ln_bwd(eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: layer_norm_ref(x, s, b, eps), x, scale, bias)
    return vjp(g)


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)
