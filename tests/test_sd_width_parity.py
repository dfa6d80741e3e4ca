"""Per-module torch parity at REAL SD1.5 widths (320/640/1280) and 768^2-
scale token counts.

Round-2 verdict: every cross-framework parity proof ran at tiny channel
widths, leaving width-dependent numerics (fp32 accumulation order, GroupNorm
group boundaries at 32 groups x 10/20/40 channels, head_dim 40/80/160
attention) unexercised. This file runs one SpatialTransformer, one
MotionModule, and one ResnetBlock per width tier against the torch twins
(`test_torch_parity.py`) with the exact production geometry of the 768^2
serving path (tokens 9216/2304/576 at batch 1). Reference modules being
twinned: `/root/reference/src/models/{transformer_2d,motion_module,resnet}.py`.

Heavier than the tiny tests (seconds per case on CPU) but far below compile
-bound; kept in the default suite.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mikudance_tpu.core import convert
from mikudance_tpu.models.layers import SpatialTransformer
from mikudance_tpu.models.motion_module import MotionModule
from mikudance_tpu.models.resnet import ResnetBlock

from test_torch_parity import (
    TResnetBlock,
    TTransformer2D,
    TVanillaTemporalModule,
    assert_close,
    nchw_out,
    nhwc,
    no_grad_test,
)

pytestmark = pytest.mark.slow  # heavy tier; see pytest.ini

# (channels, spatial) tiers of the 768^2 serving path: 96^2 @ 320,
# 48^2 @ 640, 24^2 @ 1280 (heads=8 -> head_dim 40/80/160)
TIERS = [(320, 96), (640, 48), (1280, 24)]


@pytest.mark.parametrize("c,hw", TIERS, ids=[f"{c}ch" for c, _ in TIERS])
@no_grad_test
def test_spatial_transformer_sd_width(c, hw):
    torch.manual_seed(c)
    tm = TTransformer2D(c, c, 8, 768).eval()
    x = torch.randn(1, c, hw, hw)
    ctx = torch.randn(1, 257, 768)
    ref = torch.randn(1, hw * hw, c) * 0.3

    sd = {f"a.{k}": v for k, v in tm.state_dict().items()}
    params = {}
    convert._convert_spatial_transformer(sd, "a", params, ())
    fm = SpatialTransformer(c, 8)

    want, bank_w = tm(x, ctx, write=True)
    got, bank_g = fm.apply(
        {"params": params}, nhwc(x), jnp.asarray(ctx.numpy()), write=True)
    # fp32 at real widths: contraction lengths up to 1280 -> atol scales a bit
    assert_close(nchw_out(got), want.numpy(), 2e-3, f"ST{c} write")
    assert_close(bank_g, bank_w.numpy(), 2e-3, f"ST{c} bank")

    want_r, _ = tm(x, ctx, ref=ref)
    got_r, _ = fm.apply(
        {"params": params}, nhwc(x), jnp.asarray(ctx.numpy()),
        ref=jnp.asarray(ref.numpy()))
    assert_close(nchw_out(got_r), want_r.numpy(), 2e-3, f"ST{c} read")


@pytest.mark.parametrize("c,hw", TIERS, ids=[f"{c}ch" for c, _ in TIERS])
@no_grad_test
def test_resnet_block_sd_width(c, hw):
    torch.manual_seed(c)
    tm = TResnetBlock(c, c, temb_ch=1280).eval()
    x = torch.randn(1, c, hw, hw)
    temb = torch.randn(1, 1280)

    params = {}
    sd = {f"r.{k}": v for k, v in tm.state_dict().items()}
    convert._convert_resnet(sd, "r", params, ())
    fm = ResnetBlock(c)
    got = fm.apply({"params": params}, nhwc(x), jnp.asarray(temb.numpy()))
    assert_close(nchw_out(got), tm(x, temb).numpy(), 2e-3, f"resnet{c}")


@pytest.mark.parametrize("c,hw", [(320, 24), (1280, 8)],
                         ids=["320ch", "1280ch"])
@no_grad_test
def test_motion_module_sd_width(c, hw):
    # temporal attention over T=16 frames per spatial position, real widths
    # (spatial plane reduced: the temporal math is position-independent, the
    # width-dependent numerics are per-position)
    torch.manual_seed(c)
    tm = TVanillaTemporalModule(c, heads=8, max_len=32).eval()
    torch.nn.init.normal_(tm.temporal_transformer.proj_out.weight, std=0.05)
    torch.nn.init.normal_(tm.temporal_transformer.proj_out.bias, std=0.05)
    B, T = 1, 16
    x = torch.randn(B, c, T, hw, hw)

    sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
    params = {}
    convert._convert_motion_module(sd, "m", params, ())
    fm = MotionModule(c, heads=8, max_len=32)
    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    got = fm.apply({"params": params}, xj)
    want = tm(x).permute(0, 2, 3, 4, 1).numpy()
    assert_close(got, want, 2e-3, f"motion{c}")
