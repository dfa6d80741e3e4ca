"""SD KL VAE: converted-weight output parity vs a torch twin.

diffusers is not installed here, so the oracle is a hand-rolled torch
``AutoencoderKL`` twin that reproduces the exact module structure and
state_dict key schema of the class the reference loads
(`/root/reference/scripts/inference_video.py:72-79`): DownEncoderBlock2D /
UpDecoderBlock2D resnets, the single-head mid attention, torch's asymmetric
(0,1) downsample padding, GroupNorm eps 1e-6, and the quant/post_quant 1x1
convs. If the random-init twins agree through ``convert_vae_encoder`` /
``convert_vae_decoder``, the released sd-vae-ft-mse checkpoint maps
identically (same key schema; shapes checked by construction).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

from mikudance_tpu.core.configs import VAEConfig
from mikudance_tpu.core.convert import convert_vae_decoder, convert_vae_encoder
from mikudance_tpu.models.vae import Decoder, Encoder

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


class TAttention(nn.Module):
    """diffusers' single-head mid-block attention (to_out is a ModuleList so
    the key is to_out.0.*, as `convert_vae_attention` expects)."""

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


class TDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))  # torch VAE's asymmetric pad


class TUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _Seq(nn.Module):
    """Named sub-blocks matching diffusers down/up block key layout."""

    def __init__(self, resnets, sampler=None, down=True):
        super().__init__()
        self.resnets = nn.ModuleList(resnets)
        name = "downsamplers" if down else "upsamplers"
        if sampler is not None:
            setattr(self, name, nn.ModuleList([sampler]))
        self._name = name

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        s = getattr(self, self._name, None)
        if s is not None:
            x = s[0](x)
        return x


class TMid(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = nn.ModuleList([TResnet(c, c), TResnet(c, c)])
        self.attentions = nn.ModuleList([TAttention(c)])

    def forward(self, x):
        return self.resnets[1](self.attentions[0](self.resnets[0](x)))


class TEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_in = nn.Conv2d(3, CH[0], 3, padding=1)
        blocks = []
        cin = CH[0]
        for i, c in enumerate(CH):
            resnets = [TResnet(cin if j == 0 else c, c) for j in range(LAYERS)]
            blocks.append(
                _Seq(resnets, TDown(c) if i < len(CH) - 1 else None, down=True)
            )
            cin = c
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = TMid(CH[-1])
        self.conv_norm_out = nn.GroupNorm(GROUPS, CH[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(CH[-1], 2 * LATENT, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for b in self.down_blocks:
            h = b(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        rev = list(reversed(CH))
        self.conv_in = nn.Conv2d(LATENT, rev[0], 3, padding=1)
        self.mid_block = TMid(rev[0])
        blocks = []
        cin = rev[0]
        for i, c in enumerate(rev):
            resnets = [TResnet(cin if j == 0 else c, c) for j in range(LAYERS + 1)]
            blocks.append(
                _Seq(resnets, TUp(c) if i < len(rev) - 1 else None, down=False)
            )
            cin = c
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(GROUPS, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        h = self.mid_block(self.conv_in(z))
        for b in self.up_blocks:
            h = b(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TAutoencoderKL(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TEncoder()
        self.decoder = TDecoder()
        self.quant_conv = nn.Conv2d(2 * LATENT, 2 * LATENT, 1)
        self.post_quant_conv = nn.Conv2d(LATENT, LATENT, 1)


@pytest.fixture(scope="module")
def twins():
    torch.manual_seed(0)
    tvae = TAutoencoderKL().eval()
    src = {k: v.detach().numpy() for k, v in tvae.state_dict().items()}
    cfg = VAEConfig(block_out_channels=CH, layers_per_block=LAYERS,
                    norm_num_groups=GROUPS)
    enc_params = {"params": convert_vae_encoder(src, len(CH), LAYERS)}
    dec_params = {"params": convert_vae_decoder(src, len(CH), LAYERS)}
    return tvae, cfg, enc_params, dec_params


def test_vae_encoder_converted_parity(twins):
    tvae, cfg, enc_params, _ = twins
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tvae.quant_conv(
            tvae.encoder(torch.from_numpy(x).permute(0, 3, 1, 2))
        ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(Encoder(cfg).apply(enc_params, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 4, 4, 2 * LATENT)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_vae_decoder_converted_parity(twins):
    tvae, cfg, _, dec_params = twins
    rng = np.random.default_rng(2)
    z = rng.normal(0, 1, (2, 4, 4, LATENT)).astype(np.float32)
    with torch.no_grad():
        want = tvae.decoder(
            tvae.post_quant_conv(torch.from_numpy(z).permute(0, 3, 1, 2))
        ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(Decoder(cfg).apply(dec_params, jnp.asarray(z)))
    assert got.shape == want.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
