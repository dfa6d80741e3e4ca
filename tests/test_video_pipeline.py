"""End-to-end video pipeline test vs a naive reference-style loop oracle.

The oracle follows the reference algorithm literally (per-window Python loop,
banks recomputed every step, sequential accumulation + counter division,
`pipeline_mikudance.py:575-678`) using the same Flax models; the pipeline
must produce the same latents with its batched/scanned/bank-cached schedule.
"""

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
)
from mikudance_tpu.diffusion.ddim import DDIMSchedule, inference_step_pairs
from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet
from mikudance_tpu.models.vae import Decoder, Encoder
from mikudance_tpu.core.configs import VAEConfig
from mikudance_tpu.pipelines import context as ctx_sched
from mikudance_tpu.pipelines.video import ModelBundle, VideoPipeline

TINY = UNetConfig(block_out_channels=(32, 64, 96, 96), attention_heads=4)
TINY_VAE = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=8)
T, H, W = 5, 64, 64
h, w = H // 8, W // 8


@pytest.fixture(scope="module")
def pipe():
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
    bundle = ModelBundle(guide, gp, den, dp, enc, ep, dec, dcp)
    cfg = PipelineConfig(
        width=W, height=H, num_inference_steps=3, guidance_scale=3.5,
        context=ContextConfig(frames=3, overlap=1),
        guidance_clip_mode="cond",
    )
    return VideoPipeline(bundle, cfg)


def _inputs(seed):
    rng = np.random.default_rng(seed)
    ref = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
    skel = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    pose = rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32)
    face = rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32)
    hand = rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32)
    motion = rng.normal(0, 0.1, (T, h, w, 2)).astype(np.float32)
    ctx = rng.normal(0, 1, (1, 5, 768)).astype(np.float32)
    noise = rng.normal(0, 1, (T, h, w, 4)).astype(np.float32)
    return ref, skel, pose, face, hand, motion, ctx, noise


def test_pipeline_runs_and_decodes(pipe):
    ref, skel, pose, face, hand, motion, ctx, noise = _inputs(0)
    video = pipe(ref, skel, pose, face, hand, motion, ctx, noise)
    assert video.shape == (T, H, W, 3)
    v = np.asarray(video)
    assert v.dtype == np.uint8  # on-device uint8 conversion (slow host link)
    # transfer-overlapped host decode path == device decode path, bit-exact
    host = pipe(ref, skel, pose, face, hand, motion, ctx, noise, to_host=True)
    assert isinstance(host, np.ndarray) and host.dtype == np.uint8
    np.testing.assert_array_equal(host, v)


def test_absent_streams_equal_black_frames(pipe):
    """face/hand=None (single black-frame encode, broadcast latent) is
    bit-identical to explicitly passing T black frames."""
    ref, skel, pose, _, _, motion, ctx, noise = _inputs(3)
    zeros = np.zeros((T, H, W, 3), np.float32)
    want = np.asarray(
        pipe(ref, skel, pose, zeros, zeros, motion, ctx, noise, decode=False)
    )
    got = np.asarray(
        pipe(ref, skel, pose, None, None, motion, ctx, noise, decode=False)
    )
    np.testing.assert_array_equal(got, want)


def test_uint8_single_transfer_path_matches_float(pipe):
    """uint8 inputs ride ONE stacked H2D transfer with device-side
    normalization, and all-black uint8 face/hand streams collapse to the
    absent-stream broadcast — both must be bit-identical to the float path
    (same IEEE divides, same black latent)."""
    rng = np.random.default_rng(7)
    ref_u = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    skel_u = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    pose_u = rng.integers(0, 256, (T, H, W, 3), dtype=np.uint8)
    zeros_u = np.zeros((T, H, W, 3), np.uint8)
    motion = rng.normal(0, 0.1, (T, h, w, 2)).astype(np.float32)
    ctx = rng.normal(0, 1, (1, 5, 768)).astype(np.float32)
    noise = rng.normal(0, 1, (T, h, w, 4)).astype(np.float32)

    got = np.asarray(pipe(ref_u, skel_u, pose_u, zeros_u, zeros_u,
                          motion, ctx, noise, decode=False))
    want = np.asarray(pipe(
        ref_u.astype(np.float32) / 127.5 - 1.0,
        skel_u.astype(np.float32) / 255.0,
        pose_u.astype(np.float32) / 255.0,
        np.zeros((T, H, W, 3), np.float32),
        np.zeros((T, H, W, 3), np.float32),
        motion, ctx, noise, decode=False))
    np.testing.assert_array_equal(got, want)


def test_pipeline_matches_reference_style_loop(pipe):
    """Batched/scanned pipeline == naive per-window per-step loop."""
    ref, skel, pose, face, hand, motion, ctx, noise = _inputs(1)
    latents = np.asarray(
        pipe(ref, skel, pose, face, hand, motion, ctx, noise, decode=False)
    )

    # ---- oracle ----
    b = pipe.bundle
    sched = pipe.schedule
    cfg = pipe.config

    frames = jnp.concatenate(
        [jnp.asarray(ref)[None], jnp.asarray(skel)[None], jnp.asarray(pose),
         jnp.asarray(face), jnp.asarray(hand)], axis=0)
    from mikudance_tpu.models.vae import latent_mean
    lat = latent_mean(b.vae_enc.apply(b.vae_enc_params, frames)) * 0.18215
    ref_l, skel_l = lat[0:1], lat[1:2]
    pose_l, face_l, hand_l = lat[2:2 + T], lat[2 + T:2 + 2 * T], lat[2 + 2 * T:]
    cond20 = np.asarray(jnp.concatenate(
        [jnp.broadcast_to(ref_l, (T, h, w, 4)), jnp.broadcast_to(skel_l, (T, h, w, 4)),
         pose_l, face_l, hand_l], axis=-1))

    windows = ctx_sched.window_matrix(T, cfg.context.frames, cfg.context.stride,
                                      cfg.context.overlap)
    ts, prev_ts = inference_step_pairs(sched, cfg.num_inference_steps)
    ctx_c = jnp.asarray(ctx)
    ctx_u = jnp.zeros_like(ctx_c)

    g_apply = jax.jit(b.guide.apply)
    d_apply = jax.jit(b.den.apply)

    x = jnp.asarray(noise)
    for t, tp in zip(ts, prev_ts):
        acc = np.zeros((2, T, h, w, 4), np.float32)
        counter = np.zeros((T,), np.float32)
        for win in windows:
            wc = jnp.asarray(cond20[win])
            wm = jnp.asarray(motion[win])
            wf = len(win)
            banks = g_apply(b.guide_params, wc, wm, jnp.zeros((wf,), jnp.int32),
                            jnp.broadcast_to(ctx_c, (wf, 5, 768)))
            banks2 = {k: jnp.concatenate([jnp.zeros_like(v), v], 0)
                      for k, v in banks.items()}
            lat_w = x[jnp.asarray(win)][None]  # (1, wf, h, w, 4)
            batch = jnp.concatenate([lat_w, lat_w], axis=0)
            ctx2 = jnp.concatenate([ctx_u, ctx_c], axis=0)
            pred = d_apply(b.den_params, batch, jnp.full((2,), t, jnp.int32),
                           ctx2, banks2)
            acc[:, win] += np.asarray(pred, np.float32)
            counter[win] += 1
        mean = acc / counter[None, :, None, None, None]
        noise_pred = mean[0] + float(cfg.guidance_scale) * (mean[1] - mean[0])
        x = sched.step(jnp.asarray(noise_pred), jnp.asarray(t), jnp.asarray(tp), x)

    np.testing.assert_allclose(latents, np.asarray(x), rtol=2e-4, atol=2e-4)


def test_guidance_context_parity_mode():
    from mikudance_tpu.pipelines.video import guidance_context_for_windows
    windows = np.array([[0, 1, 2, 3], [2, 3, 4, 0]])  # nw=2, wf=4 (even)
    c = jnp.ones((1, 2, 3))
    u = jnp.zeros((1, 2, 3))
    g = np.asarray(guidance_context_for_windows(windows, c, u, "reference_inference"))
    # wf even: position k gets uncond when k is even
    flat = g.reshape(2, 4, 2, 3)
    assert (flat[:, 0] == 0).all() and (flat[:, 2] == 0).all()
    assert (flat[:, 1] == 1).all() and (flat[:, 3] == 1).all()

    g2 = np.asarray(guidance_context_for_windows(windows, c, u, "cond"))
    assert (g2 == 1).all()
