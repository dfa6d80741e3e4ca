"""Temporal VAE decoder: converted-weight output parity vs a torch twin.

The reference's ``--video_decoder`` path loads diffusers'
``AutoencoderKLTemporalDecoder`` (Latte-1 ``vae_temporal_decoder``;
`/root/reference/scripts/inference_video.py:72-79`, decode loop at
`/root/reference/src/pipelines/pipeline_mikudance.py:132-150`). diffusers is
not installed here, so the oracle is a hand-rolled torch twin that reproduces
the exact module structure and state_dict key schema of that class's decoder:
SpatioTemporalResBlock (spatial resnet -> (3,1,1) temporal resnet -> learned
sigmoid alpha blend), the single-head mid attention, UpBlockTemporalDecoder
with layers_per_block+1 resnets, and the final ``time_conv_out`` Conv3d —
including the detail that the temporal resnet's GroupNorm pools statistics
over frames (input is the (B, C, T, H, W) video tensor), unlike the per-frame
spatial norms.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

from mikudance_tpu.core.configs import VAEConfig
from mikudance_tpu.core.convert import convert_temporal_decoder
from mikudance_tpu.models.vae_temporal import TemporalDecoder

pytestmark = pytest.mark.slow  # heavy tier; see pytest.ini

CH = (16, 32, 32, 32)
GROUPS = 8
LAYERS = 2
LATENT = 4


class TResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(GROUPS, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(GROUPS, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TTemporalResnet(nn.Module):
    """diffusers TemporalResnetBlock: (3,1,1) Conv3d on (B, C, T, H, W);
    GroupNorm stats therefore pool over T as well."""

    def __init__(self, c):
        super().__init__()
        self.norm1 = nn.GroupNorm(GROUPS, c, eps=1e-6)
        self.conv1 = nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
        self.norm2 = nn.GroupNorm(GROUPS, c, eps=1e-6)
        self.conv2 = nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, v):
        h = self.conv1(F.silu(self.norm1(v)))
        h = self.conv2(F.silu(self.norm2(h)))
        return v + h


class TMixer(nn.Module):
    def __init__(self):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.tensor([0.5]))


class TSTResBlock(nn.Module):
    """diffusers SpatioTemporalResBlock with merge_strategy='learned'."""

    def __init__(self, cin, cout):
        super().__init__()
        self.spatial_res_block = TResnet(cin, cout)
        self.temporal_res_block = TTemporalResnet(cout)
        self.time_mixer = TMixer()

    def forward(self, x, num_frames):
        s = self.spatial_res_block(x)  # (B*T, C, H, W)
        bt, c, hh, ww = s.shape
        v = s.reshape(bt // num_frames, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        t = self.temporal_res_block(v)
        alpha = torch.sigmoid(self.time_mixer.mix_factor)
        out = alpha * v + (1.0 - alpha) * t
        return out.permute(0, 2, 1, 3, 4).reshape(bt, c, hh, ww)


class TAttention(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(GROUPS, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        h = F.scaled_dot_product_attention(
            q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)
        ).squeeze(1)
        h = self.to_out[0](h)
        return x + h.transpose(1, 2).reshape(B, C, H, W)


class TMidTemporal(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = nn.ModuleList([TSTResBlock(c, c), TSTResBlock(c, c)])
        self.attentions = nn.ModuleList([TAttention(c)])

    def forward(self, x, num_frames):
        x = self.resnets[0](x, num_frames)
        x = self.attentions[0](x)
        return self.resnets[1](x, num_frames)


class TUpTemporal(nn.Module):
    def __init__(self, cin, cout, upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TSTResBlock(cin if j == 0 else cout, cout) for j in range(LAYERS + 1)]
        )
        if upsample:
            up = nn.Module()
            up.conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = nn.ModuleList([up])

    def forward(self, x, num_frames):
        for r in self.resnets:
            x = r(x, num_frames)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0].conv(
                F.interpolate(x, scale_factor=2, mode="nearest")
            )
        return x


class TTemporalDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        rev = list(reversed(CH))
        self.conv_in = nn.Conv2d(LATENT, rev[0], 3, padding=1)
        self.mid_block = TMidTemporal(rev[0])
        cin = rev[0]
        blocks = []
        for i, c in enumerate(rev):
            blocks.append(TUpTemporal(cin, c, upsample=i < len(rev) - 1))
            cin = c
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(GROUPS, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)
        self.time_conv_out = nn.Conv3d(3, 3, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, z):  # z: (T, 4, H, W), one video of T frames
        T = z.shape[0]
        h = self.conv_in(z)
        h = self.mid_block(h, T)
        for b in self.up_blocks:
            h = b(h, T)
        h = self.conv_out(F.silu(self.conv_norm_out(h)))  # (T, 3, H', W')
        v = h.permute(1, 0, 2, 3).unsqueeze(0)  # (1, 3, T, H', W')
        return self.time_conv_out(v).squeeze(0).permute(1, 0, 2, 3)


class TWrap(nn.Module):
    """Key schema: everything under 'decoder.', as in the real checkpoint."""

    def __init__(self):
        super().__init__()
        self.decoder = TTemporalDecoder()


@pytest.fixture(scope="module")
def twins():
    torch.manual_seed(0)
    tw = TWrap().eval()
    src = {k: v.detach().numpy() for k, v in tw.state_dict().items()}
    cfg = VAEConfig(block_out_channels=CH, layers_per_block=LAYERS,
                    norm_num_groups=GROUPS)
    params = {"params": convert_temporal_decoder(src, len(CH), LAYERS)}
    return tw, cfg, params


def test_temporal_decoder_converted_parity(twins):
    tw, cfg, params = twins
    rng = np.random.default_rng(3)
    z = rng.normal(0, 1, (5, 4, 4, LATENT)).astype(np.float32)
    with torch.no_grad():
        want = (
            tw.decoder(torch.from_numpy(z).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    got = np.asarray(TemporalDecoder(cfg).apply(params, jnp.asarray(z)))
    assert got.shape == want.shape == (5, 32, 32, 3)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_converter_accepts_stripped_time_conv_out_key(twins):
    tw, cfg, params = twins
    src = {k: v.detach().numpy() for k, v in tw.state_dict().items()}
    src["time_conv_out.weight"] = src.pop("decoder.time_conv_out.weight")
    src["time_conv_out.bias"] = src.pop("decoder.time_conv_out.bias")
    stripped = convert_temporal_decoder(src, len(CH), LAYERS)
    a = params["params"]["time_conv_out"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a),
                                  stripped["time_conv_out"]["conv"]["kernel"])


def test_frame_sharded_decode_matches_single_device(twins):
    """VERDICT r2 item 5: one chunk's frames sharded over all 8 devices
    (halo-exchanged temporal convs + psum'd joint norms) must reproduce the
    single-device decode. 8 frames = one chunk on the 8-device mesh; 9 frames
    exercise the unsharded remainder-chunk path."""
    import jax
    from mikudance_tpu.pipelines.video import SD_LATENT_SCALE, decode_frames
    from jax.sharding import Mesh

    tw, cfg, params = twins
    rng = np.random.default_rng(7)
    mesh = Mesh(np.array(jax.devices()), ("win",))  # any axis names: decode
    # re-flattens the device grid into its own 'frames' axis
    dec = TemporalDecoder(cfg).clone(decode_chunk=8)
    for T in (8, 9):
        z = (rng.normal(0, 1, (T, 4, 4, LATENT)).astype(np.float32)
             * SD_LATENT_SCALE)
        # oracle: the single-device CHUNKED decode (the shipping semantics —
        # chunk boundaries are part of the numerical contract)
        want = np.asarray(decode_frames(dec, params, jnp.asarray(z), mesh=None))
        got = np.asarray(
            jax.jit(
                lambda p, zz: decode_frames(dec, p, zz, mesh=mesh),
            )(params, jnp.asarray(z))
        )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
