"""SPMD inference parity: the mesh-sharded pipeline must equal single-device.

The reference inference is strictly single-GPU with a sequential window loop
(`pipeline_mikudance.py:624-667`); here the (CFG x windows, frames) UNet batch
shards over a ('win', 'frame') mesh — 'win' collective-free, 'frame' via
all_to_all resharding inside each motion module. These tests prove the
sharded schedule is numerically identical on the 8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mikudance_tpu.core import mesh as mesh_lib
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
from mikudance_tpu.pipelines.video import ModelBundle, VideoPipeline

pytestmark = pytest.mark.slow  # heavy tier; see pytest.ini

TINY = UNetConfig(block_out_channels=(32, 64, 96, 96), attention_heads=4)
TINY_VAE = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=8)


def test_choose_2d_mesh_shapes():
    devs = jax.devices()
    m = mesh_lib.choose_2d_mesh(devs, 2, 16)  # headline: 2 CFG windows, 16 frames
    assert dict(zip(m.axis_names, m.devices.shape)) == {"win": 2, "frame": 4}
    m = mesh_lib.choose_2d_mesh(devs, 6, 4)
    assert m.devices.size == 8 and m.shape["win"] == 2 and m.shape["frame"] == 4
    m = mesh_lib.choose_2d_mesh(devs, 6, 30)  # 30-frame windows: 6-device subset
    assert m.devices.size == 6 and m.shape["win"] == 6
    assert mesh_lib.choose_2d_mesh(devs[:1], 2, 16) is None


def _bundle(H, W):
    h = H // 8
    guide = GuidanceUNet(GuidanceUNetConfig(unet=TINY, use_man=True))
    den = DenoisingUNet(
        DenoisingUNetConfig(unet=TINY, motion=MotionModuleConfig(num_attention_heads=4))
    )
    enc, dec = Encoder(TINY_VAE), Decoder(TINY_VAE)
    rng = jax.random.PRNGKey(0)
    gp = jax.jit(guide.init)(
        rng, jnp.zeros((1, h, h, 20)), jnp.zeros((1, h, h, 2)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 768)),
    )
    dp = jax.jit(den.init)(
        rng, jnp.zeros((1, 1, h, h, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 5, 768)),
    )
    ep = jax.jit(enc.init)(rng, jnp.zeros((1, H, W, 3)))
    dcp = jax.jit(dec.init)(rng, jnp.zeros((1, h, h, 4)))
    return ModelBundle(guide, gp, den, dp, enc, ep, dec, dcp)


def _inputs(seed, T, H, W):
    h = H // 8
    rng = np.random.default_rng(seed)
    return (
        rng.uniform(-1, 1, (H, W, 3)).astype(np.float32),
        rng.uniform(0, 1, (H, W, 3)).astype(np.float32),
        rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32),
        rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32),
        rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32),
        rng.normal(0, 0.1, (T, h, h, 2)).astype(np.float32),
        rng.normal(0, 1, (1, 5, 768)).astype(np.float32),
        rng.normal(0, 1, (T, h, h, 4)).astype(np.float32),
    )


@pytest.mark.parametrize(
    "T,H,ctx_frames",
    [
        (6, 128, 4),  # nw=3, 2nw=6 -> (win 2, frame 4); all_to_all path at all levels
        (4, 64, 8),   # nw=1, 2nw=2 -> frame shards hit HW=1 level: gather fallback
    ],
)
def test_sharded_pipeline_matches_single_device(T, H, ctx_frames):
    bundle = _bundle(H, H)
    cfg = PipelineConfig(
        width=H, height=H, num_inference_steps=2, guidance_scale=3.5,
        context=ContextConfig(frames=ctx_frames, overlap=2),
        guidance_clip_mode="cond",
    )
    args = _inputs(1, T, H, H)

    plain = VideoPipeline(bundle, cfg)
    lat_plain = np.asarray(plain(*args, decode=False))

    sharded = VideoPipeline(bundle, cfg, devices=jax.devices())
    lat_sh = np.asarray(sharded(*args, decode=False))

    np.testing.assert_allclose(lat_sh, lat_plain, rtol=2e-4, atol=2e-4)

    # decode path parity (uint8: allow one quantization step)
    vid_plain = np.asarray(plain(*args)).astype(np.int32)
    vid_sh = np.asarray(sharded(*args)).astype(np.int32)
    assert np.abs(vid_sh - vid_plain).max() <= 1
