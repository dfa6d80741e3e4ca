"""Structural and semantic tests for the guidance / denoising UNets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mikudance_tpu.core.configs import (
    DenoisingUNetConfig,
    GuidanceUNetConfig,
    MotionModuleConfig,
    UNetConfig,
)
from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet, bank_keys

TINY = UNetConfig(block_out_channels=(32, 64, 96, 96), attention_heads=4)
B, T, H, W = 1, 2, 16, 16


@pytest.fixture(scope="module")
def tiny():
    """Models, params, and shared jitted entry points (compile once)."""
    guide = GuidanceUNet(GuidanceUNetConfig(unet=TINY, use_man=True))
    den = DenoisingUNet(
        DenoisingUNetConfig(unet=TINY, motion=MotionModuleConfig(num_attention_heads=4))
    )
    rng = jax.random.PRNGKey(0)
    cond = jnp.zeros((B * T, H, W, 20))
    motion = jnp.zeros((B * T, H, W, 2))
    t0 = jnp.zeros((B * T,), jnp.int32)
    ctx_f = jnp.zeros((B * T, 5, 768))
    gp = jax.jit(guide.init)(rng, cond, motion, t0, ctx_f)

    sample = jnp.zeros((B, T, H, W, 4))
    ts = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 5, 768))
    dp = jax.jit(den.init)(rng, sample, ts, ctx)

    g_apply = jax.jit(guide.apply)
    d_apply = jax.jit(den.apply)
    d_apply_nobank = jax.jit(lambda p, s, t, c: den.apply(p, s, t, c, None))
    return dict(
        guide=guide, gp=gp, den=den, dp=dp,
        g_apply=g_apply, d_apply=d_apply, d_apply_nobank=d_apply_nobank,
    )


def _rand_inputs(seed):
    rng = np.random.default_rng(seed)
    sample = jnp.asarray(rng.normal(size=(B, T, H, W, 4)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 5, 768)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B * T, H, W, 20)), jnp.float32)
    motion = jnp.asarray(rng.normal(size=(B * T, H, W, 2)), jnp.float32)
    return sample, ctx, cond, motion


def test_bank_keys_order():
    keys = bank_keys(TINY)
    assert len(keys) == 16
    assert keys[:4] == ["down_0_0", "down_0_1", "down_1_0", "down_1_1"]
    assert keys[6] == "mid"
    assert keys[-1] == "up_3_2"


def test_guidance_bank_shapes(tiny):
    _, ctx, cond, motion = _rand_inputs(0)
    ctx_f = jnp.repeat(ctx, T, axis=0)
    banks = tiny["g_apply"](
        tiny["gp"], cond, motion, jnp.zeros((B * T,), jnp.int32), ctx_f
    )
    assert set(banks.keys()) == set(bank_keys(TINY))
    # resolutions: down_i at H/2^i ; mid at H/8 ; up_i at H/2^(3-i)
    assert banks["down_0_0"].shape == (B * T, H * W, 32)
    assert banks["down_2_1"].shape == (B * T, (H // 4) * (W // 4), 96)
    assert banks["mid"].shape == (B * T, (H // 8) * (W // 8), 96)
    assert banks["up_3_0"].shape == (B * T, H * W, 32)
    for v in banks.values():
        assert np.isfinite(np.asarray(v)).all()


def test_denoise_output_shape_and_banks(tiny):
    sample, ctx, cond, motion = _rand_inputs(1)
    ts = jnp.full((B,), 500, jnp.int32)
    banks = tiny["g_apply"](
        tiny["gp"], cond, motion, jnp.zeros((B * T,), jnp.int32),
        jnp.repeat(ctx, T, axis=0),
    )
    out = tiny["d_apply"](tiny["dp"], sample, ts, ctx, banks)
    assert out.shape == sample.shape
    assert np.isfinite(np.asarray(out)).all()

    # banks must actually change the prediction
    out_none = tiny["d_apply_nobank"](tiny["dp"], sample, ts, ctx)
    assert np.abs(np.asarray(out) - np.asarray(out_none)).max() > 1e-6


def test_zero_banks_equal_no_banks(tiny):
    """ref=0 must reproduce plain self-attention — the CFG-uncond bypass
    (mutual_mix_attention.py:181-201) relies on this equivalence."""
    sample, ctx, _, _ = _rand_inputs(2)
    ts = jnp.full((B,), 10, jnp.int32)
    out_none = tiny["d_apply_nobank"](tiny["dp"], sample, ts, ctx)

    sizes = {"down_0": (H * W, 32), "down_1": (H * W // 4, 64),
             "down_2": (H * W // 16, 96), "mid": (H * W // 64, 96),
             "up_1": (H * W // 16, 96), "up_2": (H * W // 4, 64),
             "up_3": (H * W, 32)}
    banks = {}
    for k in bank_keys(TINY):
        base = "mid" if k == "mid" else k.rsplit("_", 1)[0]
        s, c = sizes[base]
        banks[k] = jnp.zeros((B * T, s, c))
    out_zero = tiny["d_apply"](tiny["dp"], sample, ts, ctx, banks)
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(out_none), atol=1e-5)


def test_motion_module_zero_init_is_identity(tiny):
    """Freshly-initialized motion modules must be the identity (proj_out is
    zero-init, motion_module.py:73-75) => 3D UNet == 2D UNet at init."""
    d2 = DenoisingUNet(
        DenoisingUNetConfig(unet=TINY, motion=MotionModuleConfig(enabled=False))
    )
    sample, ctx, _, _ = _rand_inputs(3)
    ts = jnp.full((B,), 100, jnp.int32)
    out3 = tiny["d_apply_nobank"](tiny["dp"], sample, ts, ctx)

    shared = {k: v for k, v in tiny["dp"]["params"].items() if "motion" not in k}
    p2 = jax.jit(d2.init)(jax.random.PRNGKey(5), sample, ts, ctx)
    assert set(shared.keys()) == set(p2["params"].keys())
    out2 = jax.jit(d2.apply)({"params": shared}, sample, ts, ctx)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out2), atol=1e-5)
