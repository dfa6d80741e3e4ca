"""Fused GroupNorm(+SiLU) for NHWC feature maps (Pallas TPU).

History: in the round-1 program, XLA's GroupNorm lowering inside the denoise
scan ran the stat reduce at ~10% HBM bandwidth (layout-constrained
`convert_reduce` fusions, ~165 ms/step at 768^2) and this kernel was a large
win. After the attention/layout work the balance flipped — see
``fused_group_norm``'s dispatch note; the kernel stays available behind
``PREFER_PALLAS``. It does the textbook two-pass at streaming bandwidth:

1. stats kernel: per image accumulate per-CHANNEL sum/sum-of-squares in VMEM
   (one fp32 (8, C) accumulator revisited across row blocks — lane layout,
   no cross-lane reduction on the hot path);
2. tiny XLA glue folds channels into group moments and pre-computes per-lane
   affine a = scale * rsqrt(var + eps), b = bias - mu * a;
3. apply kernel: y = x * a + b (optionally * sigmoid(y)) — one read, one write.

Total traffic = 2 reads + 1 write of x, the memory-bound optimum for an
unfused normalize. Differentiable via a custom VJP whose backward runs the
exact XLA twin (`group_norm_ref`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def group_norm_ref(x, scale, bias, groups: int, eps: float, act: Optional[str]):
    """XLA reference twin (CPU path and the exact backward)."""
    N, C = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(N, -1, groups, C // groups)
    mu = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 3), keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


# See fused_group_norm's docstring: XLA's in-graph GroupNorm now measures
# faster end-to-end than the Pallas kernel; flip to re-enable the kernel.
PREFER_PALLAS = False


def _stats_kernel(x_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    xf = x_ref[0].astype(jnp.float32)  # (hb, W, C)
    o_ref[0, 0, :] = o_ref[0, 0, :] + jnp.sum(xf, axis=(0, 1))
    o_ref[0, 1, :] = o_ref[0, 1, :] + jnp.sum(xf * xf, axis=(0, 1))


def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, act: Optional[str]):
    y = x_ref[0].astype(jnp.float32) * a_ref[0, 0] + b_ref[0, 0]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _row_block(H: int, W: int, C: int, budget: int = 1 << 20) -> int:
    """Largest divisor of H whose (hb, W, C) bf16 block fits the budget."""
    best = 1
    for hb in range(1, H + 1):
        if H % hb == 0 and hb * W * C * 2 <= budget:
            best = hb
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm(x, scale, bias, groups: int, eps: float,
                     act: Optional[str] = None, interpret: bool = False):
    """GroupNorm over NHWC x with optional fused SiLU.

    Dispatch: the XLA lowering by default. The Pallas two-pass kernel was
    the round-1 win this module was built for, but after the rest of the
    denoise loop tightened (lane-packed attention, anchored softmax) the
    balance flipped: the custom-call boundary forces row-major layouts that
    XLA pays for with transposes around the neighboring convs, and the
    measured end-to-end numbers now favor plain XLA (20-step denoise scan
    21.21 s vs 21.55 s; full headline bench 25.95 s vs 26.12 s). Set
    ``PREFER_PALLAS = True`` (or pass ``interpret=True`` in tests) to run
    the kernel."""
    from .flash_attention import FORCE_XLA

    on_tpu = (PREFER_PALLAS and not FORCE_XLA
              and jax.default_backend() == "tpu")
    if (not (on_tpu or interpret) or x.ndim != 4 or x.shape[-1] % groups != 0):
        return group_norm_ref(x, scale, bias, groups, eps, act)

    N, H, W, C = x.shape
    hb = _row_block(H, W, C)

    sums = pl.pallas_call(
        _stats_kernel,
        grid=(N, H // hb),
        in_specs=[pl.BlockSpec((1, hb, W, C), lambda n, h: (n, h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, C), lambda n, h: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * N * H * W * C,
            bytes_accessed=2 * N * H * W * C,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)

    # tiny XLA glue on (N, C): group moments -> per-lane affine
    cnt = H * W * (C // groups)
    gs = sums[:, 0, :].reshape(N, groups, C // groups).sum(-1)  # (N, G)
    gq = sums[:, 1, :].reshape(N, groups, C // groups).sum(-1)
    mu = gs / cnt
    var = jnp.maximum(gq / cnt - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mu_l = jnp.repeat(mu, C // groups, axis=1)  # (N, C)
    inv_l = jnp.repeat(inv, C // groups, axis=1)
    a = (inv_l * scale.astype(jnp.float32)[None, :]).reshape(N, 1, C)
    b = bias.astype(jnp.float32)[None, :] - mu_l * a[:, 0]
    b = b.reshape(N, 1, C)

    kernel = functools.partial(_apply_kernel, act=act)
    spec = pl.BlockSpec((1, hb, W, C), lambda n, h: (n, h, 0, 0),
                        memory_space=pltpu.VMEM)
    ab_spec = pl.BlockSpec((1, 1, C), lambda n, h: (n, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(N, H // hb),
        in_specs=[spec, ab_spec, ab_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * C,
            bytes_accessed=4 * N * H * W * C,
            transcendentals=N * H * W * C if act else 0,
        ),
        interpret=interpret,
    )(x, a, b)


def _gn_fwd(x, scale, bias, groups, eps, act, interpret):
    return (fused_group_norm(x, scale, bias, groups, eps, act, interpret),
            (x, scale, bias))


def _gn_bwd(groups, eps, act, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: group_norm_ref(x, s, b, groups, eps, act), x, scale, bias
    )
    return vjp(g)


fused_group_norm.defvjp(_gn_fwd, _gn_bwd)
