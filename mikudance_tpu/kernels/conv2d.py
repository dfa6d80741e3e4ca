"""Pallas TPU 3x3 SAME convolution (NHWC) for the UNet/VAE resnet stacks.

Why: XLA's conv fusions inside the denoise scan average ~66% of MXU peak with
~5x input re-reads from layout-constrained tiling (`convolution_add_fusion`
ops move 1.9 GB for 380 MB of tensors at 768^2). This kernel is the implicit
GEMM done the direct way:

- the input is pre-padded once in HBM; the grid walks (image, row-block,
  cout-block) and each step reads one (bh+2, W+2, Cin) window via ELEMENT
  block indexing (overlapping halo rows, no neighbor-block re-reads);
- the 3x3 taps are nine accumulated (bh*W, Cin) @ (Cin, bc) MXU matmuls with
  the tap slice taken in VMEM (sublane shifts, never HBM);
- weights for the cout block stay VMEM-resident across the whole image.

Differentiable via custom VJP whose backward is the exact XLA twin.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element


# Route the UNet resnet convs through this kernel (models/resnet.py::conv3x3).
# Off by default historically (piecewise routing measured slower than XLA's
# epilogue-fused convs); the whole-loop row-major experiment flips it together
# with group_norm.PREFER_PALLAS and layer_norm.PREFER_PALLAS.
PREFER_PALLAS = False


def conv3x3_ref(x, w, b):
    """XLA reference twin (CPU path and the custom-VJP backward)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(y.dtype)


def _conv3_kernel(x_ref, w_ref, b_ref, o_ref, *, bh: int, W: int):
    Cin = x_ref.shape[3]
    bc = w_ref.shape[3]
    bias = b_ref[0, 0].astype(jnp.float32)  # (bc,)
    acc = jnp.zeros((bh * W, bc), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            xs = x_ref[0, ky : ky + bh, kx : kx + W, :].astype(jnp.bfloat16)
            xs = xs.reshape(bh * W, Cin)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[ky, kx].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
    y = acc + bias
    o_ref[0] = y.reshape(bh, W, bc).astype(o_ref.dtype)


def _pick_bh(H: int, W: int, Cin: int, bc: int, budget: int = 3 << 20) -> int:
    """Largest divisor of H whose input window + output block + fp32
    accumulator fit the budget (double buffering doubles in/out on top)."""
    best = 1
    for bh in range(1, H + 1):
        cost = (bh + 2) * (W + 10) * Cin * 2 + bh * W * bc * (2 + 4)
        if H % bh == 0 and cost <= budget:
            best = bh
    return best


def _pick_bc(Cin: int, Cout: int, budget: int = 6 << 20) -> Optional[int]:
    """Largest legal cout block: divides Cout, weight block fits the budget
    (single-buffered: the weight block only changes with the slow cout grid
    dim), and is lane-legal (a multiple of 128, or all of Cout). None if
    impossible -> caller falls back to XLA."""
    for bc in range(Cout, 0, -1):
        if Cout % bc or 9 * Cin * bc * 2 > budget:
            continue
        if bc % 128 == 0 or bc == Cout:
            return bc
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_fused(x, w, b, interpret: bool = False):
    """3x3 stride-1 SAME conv + bias on NHWC x; Pallas on TPU."""
    from .flash_attention import FORCE_XLA

    N, H, W, Cin = x.shape
    Cout = w.shape[3]
    on_tpu = not FORCE_XLA and jax.default_backend() == "tpu"
    # Cin < 32 (e.g. the RGB conv_in): a K=3 contraction has no MXU win over
    # XLA's specialized small-channel conv — keep those on XLA
    if not (on_tpu or interpret) or x.ndim != 4 or W % 8 != 0 or Cin < 32:
        return conv3x3_ref(x, w, b)

    bc = _pick_bc(Cin, Cout)
    if bc is None:
        return conv3x3_ref(x, w, b)
    bh = _pick_bh(H, W, Cin, bc)
    # pad the width (second-minor, sublane-tiled) up to a multiple of 8 so
    # the tap slices stay tile-aligned; the extra right-pad columns are never
    # read (kx + W <= W + 2)
    wpad = (-(W + 2)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
    wb = w.astype(jnp.bfloat16)
    bb = b.reshape(1, 1, Cout).astype(jnp.float32)

    kernel = functools.partial(_conv3_kernel, bh=bh, W=W)
    return pl.pallas_call(
        kernel,
        grid=(N, H // bh, Cout // bc),
        in_specs=[
            pl.BlockSpec(
                (Element(1), Element(bh + 2), Element(W + 2 + wpad),
                 Element(Cin)),
                lambda n, h, c: (n, h * bh, 0, 0),
            ),
            pl.BlockSpec((3, 3, Cin, bc), lambda n, h, c: (0, 0, 0, c),
                         memory_space=pltpu.VMEM, pipeline_mode=pl.Buffered(1)),
            pl.BlockSpec((1, 1, bc), lambda n, h, c: (0, 0, c),
                         memory_space=pltpu.VMEM, pipeline_mode=pl.Buffered(1)),
        ],
        out_specs=pl.BlockSpec((1, bh, W, bc), lambda n, h, c: (n, h, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, Cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * Cin * Cout * 9,
            bytes_accessed=2 * N * H * W * (Cin + Cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wb, bb)


def _conv_fwd(x, w, b, interpret):
    return conv3x3_fused(x, w, b, interpret), (x, w, b)


def _conv_bwd(interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(conv3x3_ref, x, w, b)
    return vjp(g)


conv3x3_fused.defvjp(_conv_fwd, _conv_bwd)
