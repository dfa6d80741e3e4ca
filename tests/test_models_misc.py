"""VAE, CLIP tower, MAN, and motion-module unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mikudance_tpu.core.configs import CLIPVisionConfig, VAEConfig
from mikudance_tpu.models import man as man_mod
from mikudance_tpu.models.clip_vision import CLIPVisionTower
from mikudance_tpu.models.layers import get_timestep_embedding
from mikudance_tpu.models.motion_module import MotionModule, temporal_positional_encoding
from mikudance_tpu.models.vae import Decoder, Encoder, latent_mean, latent_sample

TINY_VAE = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=8)


def test_timestep_embedding_values():
    """Matches the diffusers sinusoidal formula with flip_sin_to_cos."""
    t = jnp.array([0.0, 500.0])
    emb = get_timestep_embedding(t, 320)
    assert emb.shape == (2, 320)
    half = 160
    exponent = -np.log(10000.0) * np.arange(half) / half
    freqs = np.exp(exponent)
    expected0 = np.concatenate([np.cos(0 * freqs), np.sin(0 * freqs)])
    np.testing.assert_allclose(np.asarray(emb)[0], expected0, atol=1e-6)
    expected500 = np.concatenate([np.cos(500 * freqs), np.sin(500 * freqs)])
    # fp32 phase rounding at ~400 radians: ~1e-3 vs the fp64 oracle
    np.testing.assert_allclose(np.asarray(emb)[1], expected500, atol=2e-3)


def test_instance_norm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(2, 6, 6, 4)), jnp.float32)
    y = np.asarray(man_mod.instance_norm(x))
    np.testing.assert_allclose(y.mean(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=(1, 2)), 1.0, atol=1e-3)


def test_resize_nearest_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    got = np.asarray(man_mod.resize_nearest(jnp.asarray(x), 16, 16))
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(16, 16), mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_array_equal(got, want)
    # downscale too
    got = np.asarray(man_mod.resize_nearest(jnp.asarray(x), 3, 4))
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(3, 4), mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_array_equal(got, want)


def test_temporal_pe_matches_torch_formula():
    pe = temporal_positional_encoding(8, 16)
    assert pe.shape == (8, 16)
    # position 0: sin(0)=0 on even, cos(0)=1 on odd
    np.testing.assert_allclose(pe[0, 0::2], 0.0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0)


def test_motion_module_shapes_and_zero_init():
    mm = MotionModule(dim=32, heads=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 8, 8, 32))
    p = jax.jit(mm.init)(rng, x)
    out = jax.jit(mm.apply)(p, x)
    assert out.shape == x.shape
    # zero-init proj_out -> identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


@pytest.fixture(scope="module")
def vae_models():
    enc, dec = Encoder(TINY_VAE), Decoder(TINY_VAE)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3))
    z = jnp.zeros((2, 4, 4, 4))
    ep = jax.jit(enc.init)(rng, x)
    dp = jax.jit(dec.init)(rng, z)
    return enc, ep, dec, dp, jax.jit(enc.apply), jax.jit(dec.apply)


def test_vae_shapes(vae_models):
    enc, ep, dec, dp, e_apply, d_apply = vae_models
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    moments = e_apply(ep, x)
    assert moments.shape == (2, 4, 4, 8)  # f8, 4 mean + 4 logvar
    mean = latent_mean(moments)
    assert mean.shape == (2, 4, 4, 4)
    s = latent_sample(moments, jax.random.PRNGKey(1))
    assert s.shape == mean.shape
    recon = d_apply(dp, mean)
    assert recon.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(recon)).all()


def test_clip_tower_shapes():
    cfg = CLIPVisionConfig(
        image_size=32, patch_size=16, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, projection_dim=48,
    )
    tower = CLIPVisionTower(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3))
    p = jax.jit(tower.init)(rng, x)
    out = jax.jit(tower.apply)(p, x)
    assert out.shape == (2, 5, 48)  # 4 patches + class token, projected
    assert np.isfinite(np.asarray(out)).all()


def test_temporal_conv_matches_torch_conv3d():
    """TemporalConv == torch Conv3d(k=(3,1,1), p=(1,0,0)) over frames."""
    import torch

    from mikudance_tpu.core.convert import conv_temporal_kernel, _t
    from mikudance_tpu.models.vae_temporal import TemporalConv

    rng = np.random.default_rng(0)
    T, H, W, C = 5, 4, 4, 6
    x = rng.normal(size=(T, H, W, C)).astype(np.float32)
    tconv = torch.nn.Conv3d(C, C, (3, 1, 1), padding=(1, 0, 0))
    # torch layout: (1, C, T, H, W)
    xt = torch.from_numpy(x).permute(3, 0, 1, 2)[None]
    want = tconv(xt)[0].permute(1, 2, 3, 0).detach().numpy()

    m = TemporalConv(C)
    params = {"params": {"conv": {
        "kernel": jnp.asarray(conv_temporal_kernel(tconv.weight)),
        "bias": jnp.asarray(_t(tconv.bias)),
    }}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_temporal_decoder_shapes():
    from mikudance_tpu.core.configs import VAEConfig
    from mikudance_tpu.models.vae_temporal import TemporalDecoder

    cfg = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=8)
    dec = TemporalDecoder(cfg)
    z = jnp.zeros((3, 4, 4, 4))  # 3-frame chunk of 32x32 content
    p = jax.jit(dec.init)(jax.random.PRNGKey(0), z)
    out = jax.jit(dec.apply)(p, z)
    assert out.shape == (3, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # learned alpha blend params exist per spatio-temporal block
    flat = jax.tree_util.tree_flatten_with_path(p)[0]
    mixes = [k for k, _ in flat if any("mix_factor" in str(getattr(x, "key", x)) for x in k)]
    assert len(mixes) == 2 + 4 * 3  # mid 2 + 4 up blocks x 3 resnets
