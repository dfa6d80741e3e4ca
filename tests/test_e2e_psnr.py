"""End-to-end cross-framework PSNR: the full VideoPipeline vs an all-torch
oracle that implements the reference's literal inference algorithm.

The north star (BASELINE.json) demands PSNR >= 35 dB vs the PyTorch
reference. The released checkpoints cannot be downloaded here (no network),
so this test builds the strongest in-sandbox equivalent:

- every network is a torch twin with the released-checkpoint state_dict key
  grammar (tests/test_torch_parity.py, tests/test_vae_parity.py), weights
  random but SHARED: the torch state_dicts go through ``core.convert`` — the
  exact code path real checkpoints take;
- the oracle follows `/root/reference/src/pipelines/pipeline_mikudance.py`
  step by step in torch/numpy: per-stream VAE encodes (`:483-549`), 20-ch
  condition stack (`:557-567`), per-window guidance banks (`:647-653`),
  per-window CFG denoising with counter-averaged overlap fusion
  (`:571-678`), deterministic DDIM (v-prediction, zero-SNR), frame-wise
  decode (`:115-130`);
- the pipeline runs its batched/scanned/bank-cached schedule on the
  CONVERTED params with identical inputs.

PSNR between the two decoded uint8 videos must clear the 35 dB bar — and at
fp32 it should clear it by a wide margin, so the latents are also checked
tightly. This composes the per-module conversion parity proofs into the
full serving path.
"""

import pytest

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mikudance_tpu.core import convert
from mikudance_tpu.core.configs import (
    ContextConfig,
    DenoisingUNetConfig,
    GuidanceUNetConfig,
    MotionModuleConfig,
    PipelineConfig,
    VAEConfig,
    UNetConfig,
)
from mikudance_tpu.diffusion.ddim import inference_step_pairs
from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet, bank_keys
from mikudance_tpu.models.vae import Decoder, Encoder
from mikudance_tpu.pipelines.video import ModelBundle, SD_LATENT_SCALE, VideoPipeline

from test_torch_parity import TUNet
from test_vae_parity import CH as VAE_CH, GROUPS as VAE_GROUPS, LAYERS as VAE_LAYERS
from test_vae_parity import TAutoencoderKL

pytestmark = pytest.mark.slow  # heavy tier; see pytest.ini

TINY = UNetConfig(block_out_channels=(32, 64, 96, 96), attention_heads=4)
TINY_VAE = VAEConfig(
    block_out_channels=VAE_CH, layers_per_block=VAE_LAYERS, norm_num_groups=VAE_GROUPS
)
# 128^2 (latent 16^2) keeps the deepest guidance level at 2x2: torch's
# InstanceNorm2d (the MAN twin) refuses 1x1 inputs, a tiny-scale artifact
# real geometry (96^2 latents) never hits.
T, H, W = 5, 128, 128
h, w = H // 8, W // 8
STEPS, SCALE, S_CTX = 3, 3.5, 5


def _ref_windows(steps=STEPS, num_frames=T, context_size=3, overlap=1):
    spec = importlib.util.spec_from_file_location(
        "ref_context", "/root/reference/src/pipelines/context.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return [
        list(win)
        for win in mod.uniform(
            step=0, num_steps=steps, num_frames=num_frames,
            context_size=context_size, context_stride=1, context_overlap=overlap,
        )
    ]


def _nchw(x):
    return torch.from_numpy(np.transpose(np.asarray(x, np.float32), (0, 3, 1, 2)))


def torch_encode_mean(tvae, imgs_nchw):
    moments = tvae.quant_conv(tvae.encoder(imgs_nchw))
    return moments[:, :4] * SD_LATENT_SCALE


def torch_oracle(tvae, tguide, tden, inputs, alphas_cumprod, step_pairs,
                 T=T, h=h, w=w, scale=SCALE):
    """The reference inference algorithm, verbatim, in torch/numpy.

    ``step_pairs``: the (timesteps, prev_timesteps) arrays — spacing is
    schedule DATA shared with the pipeline; the per-step UPDATE algebra
    below is an independent numpy implementation."""
    ref_img, skel, pose, face, hand, motion, clip_ctx, noise = inputs
    SCALE = scale
    windows = _ref_windows()

    # per-stream VAE encodes (latent means, scaled)
    ref_l = torch_encode_mean(tvae, _nchw(ref_img[None]))  # (1, 4, h, w)
    skel_l = torch_encode_mean(tvae, _nchw(skel[None]))
    pose_l = torch_encode_mean(tvae, _nchw(pose))  # (T, 4, h, w)
    face_l = torch_encode_mean(tvae, _nchw(face))
    hand_l = torch_encode_mean(tvae, _nchw(hand))
    cond20 = torch.cat(
        [ref_l.expand(T, -1, -1, -1), skel_l.expand(T, -1, -1, -1),
         pose_l, face_l, hand_l], dim=1,
    )  # (T, 20, h, w)
    motion_t = _nchw(motion)  # (T, 2, h, w)
    ctx_c = torch.from_numpy(clip_ctx)  # (1, S, 768)
    ctx_u = torch.zeros_like(ctx_c)

    # guidance banks per window, t=0, cond embed at every position
    # (guidance_clip_mode="cond"; the reference recomputes these per step,
    # bit-identically — once is enough for the oracle too)
    banks_per_window = []
    for win in windows:
        wf = len(win)
        _, banks = tguide(
            cond20[win], torch.zeros(wf), ctx_c.expand(wf, -1, -1),
            motion_map=motion_t[win], write=True,
        )
        banks_per_window.append(banks)

    # denoising loop: per-window CFG, counter-averaged fusion, DDIM
    ts, prev_ts = step_pairs
    latents = torch.from_numpy(noise.transpose(0, 3, 1, 2).copy())  # (T, 4, h, w)
    for t, t_prev in zip(ts, prev_ts):
        sum_u = torch.zeros_like(latents)
        sum_c = torch.zeros_like(latents)
        counter = torch.zeros(T, 1, 1, 1)
        for win, banks in zip(windows, banks_per_window):
            wf = len(win)
            lat_w = latents[win].reshape(1 * wf, 4, h, w)
            t_b = torch.full((1,), float(t))
            # uncond: zero CLIP embed + no banks (== zero banks: the bank
            # read is ADDITIVE, mutual_mix_attention.py:169-180)
            pred_u, _ = tden(lat_w, t_b, ctx_u, banks=None, T=wf)
            pred_c, _ = tden(lat_w, t_b, ctx_c, banks=banks, T=wf)
            for j, fidx in enumerate(win):
                sum_u[fidx] += pred_u[j]
                sum_c[fidx] += pred_c[j]
                counter[fidx] += 1
        mean_u, mean_c = sum_u / counter, sum_c / counter
        noise_pred = mean_u + SCALE * (mean_c - mean_u)
        latents = ddim_step_np(noise_pred, t, t_prev, latents, alphas_cumprod)

    # frame-wise decode
    frames = []
    for i in range(T):
        z = latents[i : i + 1] / SD_LATENT_SCALE
        img = tvae.decoder(tvae.post_quant_conv(z))
        frames.append(img)
    video = torch.cat(frames, dim=0).clamp(-1, 1)
    video = ((video / 2 + 0.5).clamp(0, 1) * 255.0).round()
    return latents.numpy(), video.permute(0, 2, 3, 1).numpy().astype(np.uint8)


def ddim_step_np(out, t, t_prev, x, ac):
    """Deterministic DDIM, v-prediction (independent numpy algebra)."""
    a_t = float(ac[t])
    a_prev = float(ac[t_prev]) if t_prev >= 0 else 1.0
    sqrt_a, sqrt_b = a_t**0.5, (1.0 - a_t) ** 0.5
    pred_x0 = sqrt_a * x - sqrt_b * out
    pred_eps = sqrt_a * out + sqrt_b * x
    return (a_prev**0.5) * pred_x0 + ((1.0 - a_prev) ** 0.5) * pred_eps


def run_pipeline_vs_oracle(
    tvae, tguide, tden, *, unet_cfg=TINY, vae_cfg=TINY_VAE,
    vae_blocks=None, vae_layers=VAE_LAYERS, motion_heads=4,
    T=T, H=H, W=W, steps=STEPS, scale=SCALE, s_ctx=S_CTX,
    ctx_frames=3, overlap=1, seed=11, unet_dtype=None,
):
    """Run the VideoPipeline on converted weights and the all-torch oracle on
    the same inputs; return (got_video, want_video, got_lat, want_lat).
    Shared by the pytest below and the weights-day gate
    (``scripts/verify_parity.py``), which passes real checkpoints + SD-width
    configs instead of the synthetic tiny twins."""
    global _ref_windows  # oracle windows parameterized by this call
    h_, w_ = H // 8, W // 8
    vae_blocks = vae_blocks or len(VAE_CH)

    rng = np.random.default_rng(seed)
    ref_img = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
    skel = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    pose = rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32)
    face = rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32)
    hand = rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32)
    motion = rng.normal(0, 0.3, (T, h_, w_, 2)).astype(np.float32)
    clip_ctx = rng.normal(0, 1, (1, s_ctx, 768)).astype(np.float32)
    noise = rng.normal(0, 1, (T, h_, w_, 4)).astype(np.float32)
    inputs = (ref_img, skel, pose, face, hand, motion, clip_ctx, noise)

    # pipeline on CONVERTED weights. unet_dtype: compute dtype of the two
    # UNets (None = fp32, the parity default; the multi-step SD-width gate
    # passes bf16 — the production serving dtype — and judges by PSNR).
    import jax.numpy as _jnp

    udt = unet_dtype or _jnp.float32
    vae_sd = {k: v.detach().numpy() for k, v in tvae.state_dict().items()}
    bundle = ModelBundle(
        GuidanceUNet(GuidanceUNetConfig(unet=unet_cfg, use_man=True), dtype=udt),
        {"params": convert.convert_unet(
            tguide.state_dict(), with_man=True, with_conv_out=False)},
        DenoisingUNet(DenoisingUNetConfig(
            unet=unet_cfg, motion=MotionModuleConfig(num_attention_heads=motion_heads)),
            dtype=udt),
        {"params": convert.convert_unet(tden.state_dict(), with_motion=True)},
        Encoder(vae_cfg),
        {"params": convert.convert_vae_encoder(vae_sd, vae_blocks, vae_layers)},
        Decoder(vae_cfg),
        {"params": convert.convert_vae_decoder(vae_sd, vae_blocks, vae_layers)},
    )
    pipe = VideoPipeline(
        bundle,
        PipelineConfig(
            width=W, height=H, num_inference_steps=steps, guidance_scale=scale,
            context=ContextConfig(frames=ctx_frames, overlap=overlap),
            guidance_clip_mode="cond",
        ),
    )
    # the oracle's DDIM uses the same schedule DATA but independent step algebra
    ac = np.asarray(pipe.schedule.alphas_cumprod, np.float64)
    step_pairs = inference_step_pairs(pipe.schedule, steps)

    got_lat = np.asarray(pipe(*inputs, decode=False))
    got_video = np.asarray(pipe(*inputs))

    orig_windows = _ref_windows
    _ref_windows = lambda: orig_windows(steps, T, ctx_frames, overlap)
    try:
        with torch.no_grad():
            want_lat, want_video = torch_oracle(
                tvae, tguide, tden, inputs, ac, step_pairs, T=T, h=h_, w=w_,
                scale=scale,
            )
    finally:
        _ref_windows = orig_windows
    return got_video, want_video, got_lat, want_lat


def test_full_pipeline_psnr_vs_torch_oracle():
    torch.manual_seed(3)
    tvae = TAutoencoderKL().eval()
    ch = TINY.block_out_channels
    tguide = TUNet(ch, 2, 4, 768, in_ch=20, man=True).eval()
    tden = TUNet(ch, 2, 4, 768, in_ch=4, motion=True).eval()
    for name, p in tden.named_parameters():
        if "proj_out" in name and "temporal_transformer" in name:
            torch.nn.init.normal_(p, std=0.05)

    got_video, want_video, got_lat, want_lat = run_pipeline_vs_oracle(
        tvae, tguide, tden
    )

    # latents: tight cross-framework agreement (fp32 end to end)
    np.testing.assert_allclose(
        got_lat, want_lat.transpose(0, 2, 3, 1), atol=5e-3, rtol=1e-3
    )
    # decoded videos: the north-star quality bar, with margin to spare
    diff = got_video.astype(np.float64) / 255.0 - want_video.astype(np.float64) / 255.0
    mse = np.mean(diff**2)
    psnr = 10 * np.log10(1.0 / mse) if mse > 0 else np.inf
    print(f"end-to-end PSNR vs torch oracle: {psnr:.1f} dB")
    assert psnr >= 35.0, f"PSNR {psnr:.1f} dB below the 35 dB north-star bar"
    assert psnr >= 50.0, f"PSNR {psnr:.1f} dB suspiciously low for fp32 parity"
