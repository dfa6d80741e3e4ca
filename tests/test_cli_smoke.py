"""End-to-end smoke of the inference CLI wiring on the committed demo assets.

Drives ``scripts/inference_video.py:main`` through real argv — YAML config
load, video/image IO, scene-motion fallback, CLIP embed, pipeline call, and
the 3-row comparison-grid writer (the reference's output format,
`/root/reference/scripts/inference_video.py:228-234`) — with the model
loaders monkeypatched to tiny random-init twins so the test fits CPU. The
loaders' real checkpoint mapping is covered by tests/test_convert.py; what
this test owns is everything AROUND the models (a uint8/float mixup in the
grid writer shipped precisely because no test drove this path).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # heavy tier; see pytest.ini


TINY_HW = 64


def _tiny_loaders(monkeypatch):
    from mikudance_tpu.core import loaders
    from mikudance_tpu.core.configs import (
        DenoisingUNetConfig,
        GuidanceUNetConfig,
        MotionModuleConfig,
        UNetConfig,
        VAEConfig,
    )
    from mikudance_tpu.core.params import cast_params
    from mikudance_tpu.core.configs import CLIPVisionConfig
    from mikudance_tpu.models.clip_vision import CLIPVisionTower
    from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet
    from mikudance_tpu.models.vae import Decoder, Encoder

    TINY = UNetConfig(block_out_channels=(32, 64, 96, 96), attention_heads=4)
    TINY_VAE = VAEConfig(block_out_channels=(8, 8, 8, 8), norm_num_groups=4)
    rng = jax.random.PRNGKey(0)
    lh = TINY_HW // 8

    def load_guidance_params(path, use_man=True, dtype=jnp.float32, rng_=None,
                             latent_hw=8, unet_config=None, **kw):
        guide = GuidanceUNet(GuidanceUNetConfig(unet=TINY, use_man=use_man), dtype=dtype)
        p = jax.jit(guide.init)(
            rng, jnp.zeros((1, lh, lh, 20), dtype), jnp.zeros((1, lh, lh, 2), dtype),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 257, 768), dtype),
        )
        return guide, cast_params(p, dtype)

    def load_denoising_params(path, motion_module_path=None, sd_unet_path=None,
                              use_motion=True, dtype=jnp.float32, rng_=None,
                              latent_hw=8, **kw):
        den = DenoisingUNet(
            DenoisingUNetConfig(
                unet=TINY,
                motion=MotionModuleConfig(enabled=use_motion, num_attention_heads=4),
            ),
            dtype=dtype,
        )
        p = jax.jit(den.init)(
            rng, jnp.zeros((1, 1, lh, lh, 4), dtype), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 257, 768), dtype),
        )
        return den, cast_params(p, dtype)

    def load_vae_params(vae_dir, dtype=jnp.float32, rng_=None, hw=64):
        enc, dec = Encoder(TINY_VAE, dtype=dtype), Decoder(TINY_VAE, dtype=dtype)
        ep = jax.jit(enc.init)(rng, jnp.zeros((1, TINY_HW, TINY_HW, 3), dtype))
        dp = jax.jit(dec.init)(rng, jnp.zeros((1, lh, lh, 4), dtype))
        return enc, cast_params(ep, dtype), dec, cast_params(dp, dtype)

    def load_clip_params(image_encoder_dir, dtype=jnp.float32, rng_=None):
        tower = CLIPVisionTower(
            CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=2,
                             intermediate_size=64, projection_dim=768),
            dtype=dtype,
        )
        p = jax.jit(tower.init)(rng, jnp.zeros((1, 224, 224, 3), dtype))
        return tower, cast_params(p, dtype)

    monkeypatch.setattr(loaders, "load_guidance_params", load_guidance_params)
    monkeypatch.setattr(loaders, "load_denoising_params", load_denoising_params)
    monkeypatch.setattr(loaders, "load_vae_params", load_vae_params)
    monkeypatch.setattr(loaders, "load_clip_params", load_clip_params)


def test_inference_video_cli_end_to_end(tmp_path, monkeypatch):
    _tiny_loaders(monkeypatch)

    cfg = {
        "ref_image_path": "demo_samples/chars/char.jpg",
        "ref_skel_path": "demo_samples/chars/skel-char.jpg",
        "tgt_pose_path": "demo_samples/poses/pose-demo.mp4",
        "tgt_face_path": None,  # black-frame fallback path
        "tgt_hand_path": None,
        "tgt_w2c_path": None,  # identity camera -> zero scene motion
        "tgt_c2w_path": None,
        "ref_depth_path": None,
        # exercises the reference's hyperparameter-file indirection
        # (scheduler kwargs + motion kwargs reader)
        "inference_config": "configs/inference/mikudance_config.yaml",
        "weight_dtype": "fp32",
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_path = tmp_path / "out.mp4"

    from scripts import inference_video

    monkeypatch.setattr(
        sys, "argv",
        ["inference_video", "--config", str(cfg_path),
         "-W", str(TINY_HW), "-H", str(TINY_HW),
         "--steps", "1", "--cfg", "3.5", "--seed", "7", "-L", "2",
         "--output", str(out_path)],
    )
    inference_video.main()

    assert out_path.exists() and out_path.stat().st_size > 0
    from mikudance_tpu.utils import media

    frames = media.read_frames(str(out_path))
    assert len(frames) == 2
    grid = np.asarray(frames[0])
    # 3 rows stacked vertically: ref / driving pose / generated video
    assert grid.shape == (3 * TINY_HW, TINY_HW, 3)
    rows = grid.reshape(3, TINY_HW, TINY_HW, 3)
    # the uint8/float regression binarized the ref row ((uint8 + 1)/2 wraps
    # 255 -> 0 and everything >= 1 clips to full white): the row must be the
    # ACTUAL reference image, not a threshold mask of it
    want_ref = np.asarray(
        media.load_image("demo_samples/chars/char.jpg").resize(
            (TINY_HW, TINY_HW), __import__("PIL.Image", fromlist=["Image"]).LANCZOS
        ),
        np.float32,
    )
    diff = np.abs(rows[0].astype(np.float32) - want_ref).mean()
    assert diff < 20.0, f"ref row diverges from the source image (mad={diff:.1f})"
    # the near-black skeleton row keeps its thin lines rather than saturating
    assert rows[1].mean() < 30.0 and rows[1].std() > 1.0


@pytest.mark.slow
def test_verify_parity_selfcheck():
    """The weights-day gate's --selfcheck mode: the full machinery (twin
    build -> converter -> oracle -> PSNR) must pass today with synthetic
    weights, so weights day is a data swap, not a code debug."""
    import argparse

    from scripts import verify_parity

    verdict = verify_parity.run_selfcheck(argparse.Namespace())
    assert verdict["pass"], verdict
    assert verdict["stages"]["e2e_psnr"]["psnr_db"] >= 35.0
