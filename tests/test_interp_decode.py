"""Latent interpolation + chunked-decode numerics.

- interpolate_latents (vectorized) vs a literal per-pair loop oracle of the
  reference algorithm (`pipeline_mikudance.py:330-356`, `utils.py:6-29`).
- decode_frames chunk boundaries: a 17-frame temporal decode with chunk 16
  must equal decoding z[0:16] and z[16:17] separately (the reference's
  `for i in range(0, N, 16)` loop, `pipeline_mikudance.py:132-150`) — and in
  particular the tail must NOT see zero-pad frames through the temporal convs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mikudance_tpu.core.configs import VAEConfig
from mikudance_tpu.models.vae_temporal import TemporalDecoder
from mikudance_tpu.pipelines.interpolation import interpolate_latents, lerp, slerp
from mikudance_tpu.pipelines.video import SD_LATENT_SCALE, decode_frames


def _loop_oracle(latents, factor, fn):
    n_insert = 2 ** (factor - 1) - 1
    T = latents.shape[0]
    out = []
    for i in range(T - 1):
        out.append(latents[i])
        for j in range(1, n_insert + 1):
            t = j / (n_insert + 1)
            a = latents[i].reshape(-1)
            b = latents[i + 1].reshape(-1)
            out.append(np.asarray(fn(jnp.asarray(a), jnp.asarray(b), t)).reshape(latents.shape[1:]))
    out.append(latents[-1])
    return np.stack(out)


@pytest.mark.parametrize("mode,fn", [("slerp", slerp), ("linear", lerp)])
@pytest.mark.parametrize("factor", [2, 3])
def test_interpolate_matches_loop_oracle(mode, fn, factor):
    rng = np.random.default_rng(0)
    lat = rng.normal(size=(4, 3, 5, 4)).astype(np.float32)
    got = np.asarray(interpolate_latents(jnp.asarray(lat), factor, mode))
    want = _loop_oracle(lat, factor, fn)
    n_insert = 2 ** (factor - 1) - 1
    assert got.shape[0] == (lat.shape[0] - 1) * (1 + n_insert) + 1
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_interpolate_factor1_noop():
    lat = jnp.ones((3, 2, 2, 4))
    assert interpolate_latents(lat, 1) is lat


def test_interpolate_endpoints_preserved():
    rng = np.random.default_rng(1)
    lat = rng.normal(size=(3, 2, 2, 4)).astype(np.float32)
    got = np.asarray(interpolate_latents(jnp.asarray(lat), 2, "slerp"))
    np.testing.assert_allclose(got[::2], lat, rtol=1e-6)


def test_temporal_decode_chunk_boundaries_match_reference_chunking():
    cfg = VAEConfig(block_out_channels=(8, 8, 8, 8), norm_num_groups=4)
    dec = TemporalDecoder(cfg, decode_chunk=16)
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.normal(size=(17, 4, 4, 4)).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), z[:1])

    got = np.asarray(decode_frames(dec, params, z))
    want = np.concatenate(
        [
            np.asarray(dec.apply(params, z[:16] / SD_LATENT_SCALE)),
            np.asarray(dec.apply(params, z[16:] / SD_LATENT_SCALE)),
        ],
        axis=0,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # sanity: chunking is NOT equivalent to whole-clip decode (temporal convs
    # couple frames), which is exactly why the chunk size must match the
    # reference's 16.
    whole = np.asarray(dec.apply(params, z / SD_LATENT_SCALE))
    assert np.abs(whole[15] - want[15]).max() > 1e-6


def test_sd_decode_chunking_frame_independent():
    from mikudance_tpu.models.vae import Decoder

    cfg = VAEConfig(block_out_channels=(8, 8, 8, 8), norm_num_groups=4)
    dec = Decoder(cfg)
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(5, 4, 4, 4)).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), z[:1])
    got = np.asarray(decode_frames(dec, params, z))
    want = np.asarray(dec.apply(params, z / SD_LATENT_SCALE))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
