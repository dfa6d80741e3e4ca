"""Per-step (streamed) bank mode == cached bank mode, numerically.

The cached path materializes every (window, position) reference-attention
bank for the whole denoise scan; long videos cannot fit that in one chip's
HBM (~52 MB/position at 768^2), so `_denoise_streamed` recomputes banks per
step in window groups — the reference's own memory behavior
(`pipeline_mikudance.py:647-653`). Banks are step-independent, so the two
modes must agree to reduction-order noise.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mikudance_tpu.core.configs import (
    ContextConfig,
    DenoisingUNetConfig,
    GuidanceUNetConfig,
    MotionModuleConfig,
    PipelineConfig,
    UNetConfig,
    VAEConfig,
)
from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet
from mikudance_tpu.models.vae import Decoder, Encoder
from mikudance_tpu.pipelines.video import (
    ModelBundle,
    VideoPipeline,
    choose_bank_group,
)

pytestmark = pytest.mark.slow  # heavy tier; see pytest.ini

TINY = UNetConfig(block_out_channels=(32, 64, 96, 96), attention_heads=4)
TINY_VAE = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=8)
T, H, W = 6, 64, 64
h, w = H // 8, W // 8


@pytest.fixture(scope="module")
def bundle():
    guide = GuidanceUNet(GuidanceUNetConfig(unet=TINY, use_man=True))
    den = DenoisingUNet(
        DenoisingUNetConfig(unet=TINY, motion=MotionModuleConfig(num_attention_heads=4))
    )
    enc, dec = Encoder(TINY_VAE), Decoder(TINY_VAE)
    rng = jax.random.PRNGKey(0)
    gp = jax.jit(guide.init)(
        rng, jnp.zeros((1, h, w, 20)), jnp.zeros((1, h, w, 2)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 768)),
    )
    dp = jax.jit(den.init)(
        rng, jnp.zeros((1, 1, h, w, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 5, 768)),
    )
    ep = jax.jit(enc.init)(rng, jnp.zeros((1, H, W, 3)))
    dcp = jax.jit(dec.init)(rng, jnp.zeros((1, h, w, 4)))
    return ModelBundle(guide, gp, den, dp, enc, ep, dec, dcp)


def _inputs():
    rng = np.random.default_rng(5)
    return (
        rng.uniform(-1, 1, (H, W, 3)).astype(np.float32),
        rng.uniform(0, 1, (H, W, 3)).astype(np.float32),
        rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32),
        rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32),
        rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32),
        rng.normal(0, 0.3, (T, h, w, 2)).astype(np.float32),
        rng.normal(0, 1, (1, 5, 768)).astype(np.float32),
        rng.normal(0, 1, (T, h, w, 4)).astype(np.float32),
    )


@pytest.mark.parametrize("mode", ["reference_inference", "cond"])
def test_streamed_equals_cached(bundle, mode):
    base = PipelineConfig(
        width=W, height=H, num_inference_steps=2, guidance_scale=3.5,
        context=ContextConfig(frames=3, overlap=1), guidance_clip_mode=mode,
    )
    inputs = _inputs()
    cached = np.asarray(
        VideoPipeline(bundle, dataclasses.replace(base, bank_mode="cached"))(
            *inputs, decode=False
        )
    )
    # budget of 3 positions with 3-frame windows forces group=1: banks for a
    # single window at a time, the maximally-streamed schedule
    streamed = np.asarray(
        VideoPipeline(
            bundle,
            dataclasses.replace(base, bank_mode="per_step", cached_bank_positions=3),
        )(*inputs, decode=False)
    )
    # CFG runs as masked HALF-batches in the streamed path (video.py::half),
    # so XLA tiles reductions differently than the doubled-batch cached
    # program: tolerance covers that reduction-order drift
    np.testing.assert_allclose(streamed, cached, atol=1e-4, rtol=1e-4)


def test_cached_q8_matches_exact(bundle):
    """bank_mode="cached_q8": the int8 full-position bank cache (which frees
    long videos from per-(step, group) guidance recompute) must stay within
    the parity budget of the exact cached path. PSNR here is on the decoded
    uint8 video — the same yardstick as the 35 dB reference-parity bar."""
    base = PipelineConfig(
        width=W, height=H, num_inference_steps=2, guidance_scale=3.5,
        context=ContextConfig(frames=3, overlap=1), guidance_clip_mode="cond",
        max_denoise_frame_batch=6,  # forces the grouped (streamed) denoiser
    )
    inputs = _inputs()
    exact = np.asarray(
        VideoPipeline(bundle, dataclasses.replace(base, bank_mode="cached"))(
            *inputs
        )
    ).astype(np.float32)
    q8 = np.asarray(
        VideoPipeline(
            bundle,
            dataclasses.replace(base, bank_mode="cached_q8",
                                cached_bank_positions=3),
        )(*inputs)
    ).astype(np.float32)
    mse = float(np.mean((exact - q8) ** 2))
    psnr = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 40.0, f"cached_q8 vs exact PSNR {psnr:.1f} dB < 40"


def test_cached_q8_sharded_equals_single(bundle):
    """VERDICT r4 item 4: cached_q8 under SPMD — the dedup'd int8 bank
    buffers replicate, the window GROUPS shard (with zero-weight padding
    when they don't divide), and the result must equal single-device q8
    exactly up to psum reduction order."""
    base = PipelineConfig(
        width=W, height=H, num_inference_steps=2, guidance_scale=3.5,
        context=ContextConfig(frames=3, overlap=1), guidance_clip_mode="cond",
        bank_mode="cached_q8", max_denoise_frame_batch=6,
        cached_bank_positions=3,
    )
    inputs = _inputs()
    single = np.asarray(VideoPipeline(bundle, base)(*inputs, decode=False))
    # nw=6: groups split evenly over 2 devices; over 8 only via the
    # zero-weight window padding — exercise both. Tolerance: the sharded
    # schedule uses a different group size (1 vs 2), so the dequantized-bank
    # segment sums accumulate in a different order.
    for n_dev in (2, 8):
        sharded = np.asarray(
            VideoPipeline(bundle, base, devices=jax.devices()[:n_dev])(
                *inputs, decode=False
            )
        )
        np.testing.assert_allclose(sharded, single, atol=1e-4, rtol=1e-4)


def test_auto_mode_picks_streaming_past_budget(bundle):
    cfg = PipelineConfig(
        width=W, height=H, num_inference_steps=2,
        context=ContextConfig(frames=3, overlap=1), guidance_clip_mode="cond",
        bank_mode="auto", cached_bank_positions=3,  # nw*wf will exceed 3
    )
    pipe = VideoPipeline(bundle, cfg)
    out = pipe(*_inputs(), decode=False)  # exercises the streamed path
    assert np.isfinite(np.asarray(out)).all()


def test_choose_bank_group():
    assert choose_bank_group(6, 3, budget_positions=3) == 1
    assert choose_bank_group(6, 3, budget_positions=6) == 2
    assert choose_bank_group(6, 3, budget_positions=9) == 3
    assert choose_bank_group(6, 3, budget_positions=64) == 6
    assert choose_bank_group(7, 30, budget_positions=64) == 1  # prime nw
    assert choose_bank_group(1, 30, budget_positions=1) == 1


def test_streamed_sharded_equals_single_device(bundle):
    """VERDICT r2 item 4: SPMD bank streaming — window groups sharded over
    the 8-device mesh with psum'd fusion sums must equal the single-device
    streamed denoise."""
    base = PipelineConfig(
        width=W, height=H, num_inference_steps=2, guidance_scale=3.5,
        context=ContextConfig(frames=3, overlap=1), guidance_clip_mode="cond",
        bank_mode="per_step", cached_bank_positions=3,
    )
    inputs = _inputs()
    single = np.asarray(VideoPipeline(bundle, base)(*inputs, decode=False))
    # T=6 / 3-frame windows -> nw=6 -> groups of 1 shard over... 6 groups on
    # an 8-device mesh do NOT split evenly; use 2 devices (6 % 2 == 0)
    sharded_pipe = VideoPipeline(bundle, base, devices=jax.devices()[:2])
    sharded = np.asarray(sharded_pipe(*inputs, decode=False))
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=1e-5)


def test_streamed_sharded_pads_nondividing_windows(bundle):
    """VERDICT r3 item 7: when the window count does NOT split into equal
    group shards (6 windows, 8 devices), the pipeline pads with duplicate
    zero-weight windows instead of silently falling back to single-device —
    and the masked fusion sums keep the result identical."""
    base = PipelineConfig(
        width=W, height=H, num_inference_steps=2, guidance_scale=3.5,
        context=ContextConfig(frames=3, overlap=1), guidance_clip_mode="cond",
        bank_mode="per_step", cached_bank_positions=3,
    )
    inputs = _inputs()
    single = np.asarray(VideoPipeline(bundle, base)(*inputs, decode=False))
    # T=6 / 3-frame windows -> nw=6; 6 groups cannot split over 8 devices,
    # so the mesh path must pad to 8 windows (2 zero-weight duplicates)
    assert choose_bank_group(6, 3, budget_positions=3, n_shards=8) is None
    sharded_pipe = VideoPipeline(bundle, base, devices=jax.devices()[:8])
    sharded = np.asarray(sharded_pipe(*inputs, decode=False))
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=1e-5)


def test_choose_bank_group_sharded():
    assert choose_bank_group(6, 3, budget_positions=3, n_shards=2) == 1
    assert choose_bank_group(6, 3, budget_positions=9, n_shards=2) == 3
    assert choose_bank_group(6, 3, budget_positions=9, n_shards=3) == 2
    # no divisor yields a group count splitting over 4 shards
    assert choose_bank_group(6, 3, budget_positions=9, n_shards=4) is None


def test_step_chunked_execution_equals_one_scan(bundle):
    """`max_exec_frame_passes` slices the grouped-denoise step scan into
    host-dispatched chunks (long videos must not run one multi-minute XLA
    execution); the DDIM recursion is sequential either way, so chunked
    (k=1 and k=2 per execution) must equal the single 4-step scan."""
    base = PipelineConfig(
        width=W, height=H, num_inference_steps=4, guidance_scale=3.5,
        context=ContextConfig(frames=3, overlap=1), guidance_clip_mode="cond",
        bank_mode="per_step", cached_bank_positions=3,
    )
    inputs = _inputs()
    one_scan = np.asarray(VideoPipeline(bundle, base)(*inputs, decode=False))
    # T=6 / 3-frame windows -> nw=6, wf=3 -> 36 frame-passes per step:
    # budget 36 -> 1 step/execution; budget 72 -> 2 steps/execution
    for budget in (36, 72):
        chunked = np.asarray(
            VideoPipeline(
                bundle, dataclasses.replace(base, max_exec_frame_passes=budget)
            )(*inputs, decode=False)
        )
        np.testing.assert_allclose(chunked, one_scan, atol=2e-5, rtol=1e-5)


def test_steps_per_exec():
    from mikudance_tpu.pipelines.video import VideoPipeline as VP

    class Dummy:
        pass

    def mk(budget):
        d = Dummy()
        d.config = dataclasses.replace(PipelineConfig(), max_exec_frame_passes=budget)
        return d

    spe = VP._steps_per_exec
    assert spe(mk(640), 20, 1, 16) == 20     # headline geometry: one scan
    assert spe(mk(640), 20, 2, 30) == 5      # T=40: 120 passes/step -> 5
    assert spe(mk(640), 20, 7, 30) == 1      # T=160: 420 passes/step -> 1
    assert spe(mk(0), 20, 7, 30) == 20       # disabled
    assert spe(mk(100), 19, 2, 30) == 1      # prime steps: fall to 1


def test_cached_grouped_equals_plain(bundle):
    """Cached-GROUPED denoise (all banks precomputed, UNet scans window
    groups with CFG as masked passes) == the plain all-windows batch."""
    base = PipelineConfig(
        width=W, height=H, num_inference_steps=2, guidance_scale=3.5,
        context=ContextConfig(frames=3, overlap=1), guidance_clip_mode="cond",
        bank_mode="cached",
    )
    inputs = _inputs()
    plain = np.asarray(VideoPipeline(bundle, base)(*inputs, decode=False))
    grouped = np.asarray(
        VideoPipeline(
            bundle, dataclasses.replace(base, max_denoise_frame_batch=6)
        )(*inputs, decode=False)  # nw*wf = 18 > 6 -> groups of 2 windows
    )
    np.testing.assert_allclose(grouped, plain, atol=1e-4, rtol=1e-4)
