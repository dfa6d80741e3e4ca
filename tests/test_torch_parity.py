"""Whole-module numerical parity against hand-rolled PyTorch twins.

Round-1 review flagged that parity was only proven at primitive level
(conv/GN/LN/SDPA). This file closes that: each MikuDance module is rebuilt
as a PyTorch twin implementing the *reference's* semantics (diffusers
ResnetBlock2D / Transformer2DModel / BasicTransformerBlock, the AnimateDiff
motion module `/root/reference/src/models/motion_module.py:96-290`, the MAN
module `/root/reference/src/models/man_module.py:7-33`, and the two UNets'
block wiring) with the *same state_dict key grammar as the released
checkpoints*. The twin's state_dict goes through `core.convert` and the Flax
module must reproduce the torch activations. diffusers itself is not
installable here (no network), so the twins are written from the reference's
module definitions, not imported.

Also imports the reference's dependency-free `src/pipelines/context.py`
directly as an oracle for the sliding-window schedule.
"""

import importlib.util
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mikudance_tpu.core import convert
from mikudance_tpu.core.configs import (
    DenoisingUNetConfig,
    GuidanceUNetConfig,
    MotionModuleConfig,
    UNetConfig,
)
from mikudance_tpu.models.layers import SpatialTransformer
from mikudance_tpu.models.man import MANBlock
from mikudance_tpu.models.motion_module import MotionModule
from mikudance_tpu.models.resnet import ResnetBlock
from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet, bank_keys

torch.manual_seed(0)
torch.set_default_dtype(torch.float32)


def no_grad_test(fn):
    """Per-test no_grad. (A module-scope set_grad_enabled(False) would leak
    into other test modules' torch.autograd.gradcheck.)"""
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **k):
        with torch.no_grad():
            return fn(*a, **k)

    return wrapper


# ---------------------------------------------------------------------------
# torch twins (reference semantics, released-checkpoint key names)
# ---------------------------------------------------------------------------


class TAttention(torch.nn.Module):
    """diffusers Attention: to_q/k/v (no bias) + to_out.0 (bias), fp32 softmax."""

    def __init__(self, dim, heads, kv_dim=None):
        super().__init__()
        self.heads = heads
        self.to_q = torch.nn.Linear(dim, dim, bias=False)
        self.to_k = torch.nn.Linear(kv_dim or dim, dim, bias=False)
        self.to_v = torch.nn.Linear(kv_dim or dim, dim, bias=False)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        B, S, C = q.shape
        h, d = self.heads, C // self.heads
        q = q.view(B, -1, h, d).transpose(1, 2)
        k = k.view(B, -1, h, d).transpose(1, 2)
        v = v.view(B, -1, h, d).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) * d**-0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, S, C)
        return self.to_out[0](out)


class TGEGLU(torch.nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = torch.nn.Linear(dim, inner * 2)

    def forward(self, x):
        a, g = self.proj(x).chunk(2, dim=-1)
        return a * torch.nn.functional.gelu(g)


class TFeedForward(torch.nn.Module):
    """diffusers FeedForward(geglu): net.0 = GEGLU, net.1 = Dropout, net.2 = Linear."""

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = torch.nn.ModuleList(
            [TGEGLU(dim, inner), torch.nn.Dropout(0.0), torch.nn.Linear(inner, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TBasicTransformerBlock(torch.nn.Module):
    """(Temporal)BasicTransformerBlock with the bank write/read contract of
    `mutual_mix_attention.py:140,169-201` made explicit: write returns norm_h,
    read uses K/V = norm_h + ref."""

    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn1 = TAttention(dim, heads)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.attn2 = TAttention(dim, heads, kv_dim=ctx_dim)
        self.norm3 = torch.nn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, ctx, ref=None, write=False):
        nh = self.norm1(x)
        bank = nh if write else None
        x = x + self.attn1(nh, None if ref is None else nh + ref)
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x, bank


class TTransformer2D(torch.nn.Module):
    """Transformer2DModel, SD1.5 config (1x1-conv projections, 1 block)."""

    def __init__(self, ch, dim, heads, ctx_dim, groups=32):
        super().__init__()
        self.norm = torch.nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = torch.nn.Conv2d(ch, dim, 1)
        self.transformer_blocks = torch.nn.ModuleList(
            [TBasicTransformerBlock(dim, heads, ctx_dim)]
        )
        self.proj_out = torch.nn.Conv2d(dim, ch, 1)

    def forward(self, x, ctx, ref=None, write=False):
        B, C, H, W = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, -1)
        h, bank = self.transformer_blocks[0](h, ctx, ref=ref, write=write)
        h = h.reshape(B, H, W, -1).permute(0, 3, 1, 2)
        return self.proj_out(h) + res, bank


class TResnetBlock(torch.nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = torch.nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = torch.nn.Linear(temb_ch, out_ch)
        self.norm2 = torch.nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = torch.nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = torch.nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(torch.nn.functional.silu(temb))[:, :, None, None]
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TPositionalEncoding(torch.nn.Module):
    def __init__(self, dim, max_len=32):
        super().__init__()
        position = torch.arange(max_len, dtype=torch.float64)[:, None]
        div = torch.exp(
            torch.arange(0, dim, 2, dtype=torch.float64) * (-math.log(10000.0) / dim)
        )
        pe = torch.zeros(1, max_len, dim, dtype=torch.float64)
        pe[0, :, 0::2] = torch.sin(position * div)
        pe[0, :, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe.float(), persistent=False)

    def forward(self, x):
        return x + self.pe[:, : x.size(1)]


class TVersatileAttention(TAttention):
    """Temporal_Self attention: PE applied to the query path only — the K/V
    tensor is aliased *before* the positional encoder runs
    (`motion_module.py:404-417`)."""

    def __init__(self, dim, heads, max_len):
        super().__init__(dim, heads)
        self.pos_encoder = TPositionalEncoding(dim, max_len)

    def forward(self, x, video_length):
        bf, d, c = x.shape
        b = bf // video_length
        t = (
            x.reshape(b, video_length, d, c)
            .permute(0, 2, 1, 3)
            .reshape(b * d, video_length, c)
        )
        kv = t
        t = self.pos_encoder(t)
        out = super().forward(t, kv)
        return (
            out.reshape(b, d, video_length, c)
            .permute(0, 2, 1, 3)
            .reshape(bf, d, c)
        )


class TTemporalTransformerBlock(torch.nn.Module):
    def __init__(self, dim, heads, max_len, n_attn=2):
        super().__init__()
        self.attention_blocks = torch.nn.ModuleList(
            [TVersatileAttention(dim, heads, max_len) for _ in range(n_attn)]
        )
        self.norms = torch.nn.ModuleList(
            [torch.nn.LayerNorm(dim) for _ in range(n_attn)]
        )
        self.ff = TFeedForward(dim)
        self.ff_norm = torch.nn.LayerNorm(dim)

    def forward(self, x, video_length):
        for attn, norm in zip(self.attention_blocks, self.norms):
            x = attn(norm(x), video_length) + x
        return self.ff(self.ff_norm(x)) + x


class TTemporalTransformer3D(torch.nn.Module):
    def __init__(self, ch, heads, max_len, n_blocks=1, groups=32):
        super().__init__()
        self.norm = torch.nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = torch.nn.Linear(ch, ch)
        self.transformer_blocks = torch.nn.ModuleList(
            [TTemporalTransformerBlock(ch, heads, max_len) for _ in range(n_blocks)]
        )
        self.proj_out = torch.nn.Linear(ch, ch)

    def forward(self, x):
        # x: (b, c, f, h, w)
        b, c, f, hh, ww = x.shape
        h = x.permute(0, 2, 1, 3, 4).reshape(b * f, c, hh, ww)
        res = h
        h = self.norm(h)
        h = h.permute(0, 2, 3, 1).reshape(b * f, hh * ww, c)
        h = self.proj_in(h)
        for blk in self.transformer_blocks:
            h = blk(h, video_length=f)
        h = self.proj_out(h)
        h = h.reshape(b * f, hh, ww, c).permute(0, 3, 1, 2)
        out = h + res
        return out.reshape(b, f, c, hh, ww).permute(0, 2, 1, 3, 4)


class TVanillaTemporalModule(torch.nn.Module):
    def __init__(self, ch, heads, max_len, n_blocks=1):
        super().__init__()
        self.temporal_transformer = TTemporalTransformer3D(ch, heads, max_len, n_blocks)

    def forward(self, x):
        return self.temporal_transformer(x)


class TMANModule(torch.nn.Module):
    def __init__(self, ch, m_dim=2, nhidden=128):
        super().__init__()
        self.norm = torch.nn.InstanceNorm2d(ch, affine=False)
        self.mlp_shared = torch.nn.Sequential(
            torch.nn.Conv2d(m_dim, nhidden, 3, padding=1), torch.nn.ReLU()
        )
        self.mlp_gamma = torch.nn.Conv2d(nhidden, ch, 3, padding=1)
        self.mlp_beta = torch.nn.Conv2d(nhidden, ch, 3, padding=1)

    def forward(self, x, motion_map):
        normalized = self.norm(x)
        m = torch.nn.functional.interpolate(motion_map, size=x.shape[2:], mode="nearest")
        actv = self.mlp_shared(m)
        return normalized * (1 + self.mlp_gamma(actv)) + self.mlp_beta(actv)


def timestep_embedding_torch(t, dim):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = torch.exp(exponent)[None, :] * t.float()[:, None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)  # flip_sin_to_cos


class TTimeEmbedding(torch.nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = torch.nn.Linear(in_dim, dim)
        self.linear_2 = torch.nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(torch.nn.functional.silu(self.linear_1(x)))


class _Blank(torch.nn.Module):
    pass


class TUNet(torch.nn.Module):
    """SD1.5-wiring UNet twin (4 levels, 2 layers, cross-attn on levels 0-2),
    optional motion modules (denoising 3D variant, frames folded) and MAN
    blocks (guidance MIX variant). Checkpoint keys match diffusers/reference."""

    def __init__(self, ch, layers, heads, ctx_dim, in_ch, out_ch=4,
                 groups=32, eps=1e-5, motion=False, man=False, max_len=32):
        super().__init__()
        n = len(ch)
        self.n, self.layers, self.motion, self.man = n, layers, motion, man
        temb_dim = ch[0] * 4
        self.conv_in = torch.nn.Conv2d(in_ch, ch[0], 3, padding=1)
        self.time_embedding = TTimeEmbedding(ch[0], temb_dim)

        skips = [ch[0]]
        cur = ch[0]
        self.down_blocks = torch.nn.ModuleList()
        for i in range(n):
            blk = _Blank()
            blk.resnets = torch.nn.ModuleList()
            has_attn = i < n - 1
            if has_attn:
                blk.attentions = torch.nn.ModuleList()
            if motion:
                blk.motion_modules = torch.nn.ModuleList()
            for j in range(layers):
                blk.resnets.append(TResnetBlock(cur, ch[i], temb_dim, groups, eps))
                cur = ch[i]
                if has_attn:
                    blk.attentions.append(
                        TTransformer2D(ch[i], ch[i], heads, ctx_dim, groups))
                if motion:
                    blk.motion_modules.append(
                        TVanillaTemporalModule(ch[i], heads, max_len))
                skips.append(ch[i])
            if i < n - 1:
                ds = _Blank()
                ds.conv = torch.nn.Conv2d(ch[i], ch[i], 3, stride=2, padding=1)
                blk.downsamplers = torch.nn.ModuleList([ds])
                skips.append(ch[i])
            self.down_blocks.append(blk)

        if man:
            self.man_blocks = torch.nn.ModuleList(
                [TMANModule(ch[i]) for i in range(n)])

        mid = _Blank()
        mid.resnets = torch.nn.ModuleList(
            [TResnetBlock(ch[-1], ch[-1], temb_dim, groups, eps) for _ in range(2)])
        mid.attentions = torch.nn.ModuleList(
            [TTransformer2D(ch[-1], ch[-1], heads, ctx_dim, groups)])
        if motion:
            mid.motion_modules = torch.nn.ModuleList(
                [TVanillaTemporalModule(ch[-1], heads, max_len)])
        self.mid_block = mid

        rev = list(reversed(ch))
        self.up_blocks = torch.nn.ModuleList()
        for i in range(n):
            out_c = rev[i]
            blk = _Blank()
            blk.resnets = torch.nn.ModuleList()
            has_attn = i > 0
            if has_attn:
                blk.attentions = torch.nn.ModuleList()
            if motion:
                blk.motion_modules = torch.nn.ModuleList()
            for j in range(layers + 1):
                skip = skips.pop()
                blk.resnets.append(TResnetBlock(cur + skip, out_c, temb_dim, groups, eps))
                cur = out_c
                if has_attn:
                    blk.attentions.append(
                        TTransformer2D(out_c, out_c, heads, ctx_dim, groups))
                if motion:
                    blk.motion_modules.append(
                        TVanillaTemporalModule(out_c, heads, max_len))
            if i < n - 1:
                us = _Blank()
                us.conv = torch.nn.Conv2d(out_c, out_c, 3, padding=1)
                blk.upsamplers = torch.nn.ModuleList([us])
            self.up_blocks.append(blk)

        self.conv_norm_out = torch.nn.GroupNorm(groups, ch[0], eps=eps)
        self.conv_out = torch.nn.Conv2d(ch[0], out_ch, 3, padding=1)

    def forward(self, x, t, ctx, banks=None, motion_map=None, T=1, write=False):
        """x: (B*T, C_in, H, W); banks keyed like models.unet.bank_keys."""
        out_banks = {}
        B = x.shape[0] // T
        temb = self.time_embedding(timestep_embedding_torch(t, self.conv_in.out_channels))
        temb_f = temb.repeat_interleave(T, 0)
        ctx_f = ctx.repeat_interleave(T, 0)

        def mm(mod, h):
            bt, c, hh, ww = h.shape
            v = h.reshape(B, T, c, hh, ww).permute(0, 2, 1, 3, 4)
            v = mod(v)
            return v.permute(0, 2, 1, 3, 4).reshape(bt, c, hh, ww)

        def ref(key):
            return None if banks is None else banks.get(key)

        h = self.conv_in(x)
        skips = [h]
        for i, blk in enumerate(self.down_blocks):
            has_attn = i < self.n - 1
            for j in range(self.layers):
                h = blk.resnets[j](h, temb_f)
                if has_attn:
                    h, bank = blk.attentions[j](
                        h, ctx_f, ref=ref(f"down_{i}_{j}"), write=write)
                    out_banks[f"down_{i}_{j}"] = bank
                if self.motion:
                    h = mm(blk.motion_modules[j], h)
                skips.append(h)
            if has_attn:
                h = blk.downsamplers[0].conv(h)
                skips.append(h)
            if self.man and motion_map is not None:
                h = self.man_blocks[i](h, motion_map)

        h = self.mid_block.resnets[0](h, temb_f)
        h, bank = self.mid_block.attentions[0](h, ctx_f, ref=ref("mid"), write=write)
        out_banks["mid"] = bank
        if self.motion:
            h = mm(self.mid_block.motion_modules[0], h)
        h = self.mid_block.resnets[1](h, temb_f)

        for i, blk in enumerate(self.up_blocks):
            has_attn = i > 0
            for j in range(self.layers + 1):
                h = torch.cat([h, skips.pop()], dim=1)
                h = blk.resnets[j](h, temb_f)
                if has_attn:
                    h, bank = blk.attentions[j](
                        h, ctx_f, ref=ref(f"up_{i}_{j}"), write=write)
                    out_banks[f"up_{i}_{j}"] = bank
                if self.motion:
                    h = mm(blk.motion_modules[j], h)
            if i < self.n - 1:
                h = torch.nn.functional.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)

        h = self.conv_out(torch.nn.functional.silu(self.conv_norm_out(h)))
        return h, out_banks


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

TINY = UNetConfig(block_out_channels=(32, 64, 96, 96), attention_heads=4)


def nhwc(x):
    return jnp.asarray(x.permute(0, 2, 3, 1).numpy())


def nchw_out(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def assert_close(got, want, atol, name):
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    err = np.max(np.abs(got - want))
    assert err < atol, f"{name}: max abs err {err:.2e} >= {atol}"


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@no_grad_test
def test_resnet_block_parity():
    tm = TResnetBlock(32, 64, temb_ch=128)
    x = torch.randn(2, 32, 8, 8)
    temb = torch.randn(2, 128)
    want = tm(x, temb)

    params = {}
    sd = {f"r.{k}": v for k, v in tm.state_dict().items()}
    convert._convert_resnet(sd, "r", params, ())

    fm = ResnetBlock(64)
    got = fm.apply({"params": params}, nhwc(x), jnp.asarray(temb.numpy()))
    assert_close(nchw_out(got), want.numpy(), 2e-4, "resnet")


@no_grad_test
def test_spatial_transformer_parity_write_and_read():
    tm = TTransformer2D(64, 64, 4, 768)
    x = torch.randn(2, 64, 8, 8)
    ctx = torch.randn(2, 5, 768)
    ref = torch.randn(2, 64, 64)

    sd = {f"a.{k}": v for k, v in tm.state_dict().items()}
    params = {}
    convert._convert_spatial_transformer(sd, "a", params, ())
    fm = SpatialTransformer(64, 4)

    want, bank_w = tm(x, ctx, write=True)
    got, bank_g = fm.apply({"params": params}, nhwc(x), jnp.asarray(ctx.numpy()), write=True)
    assert_close(nchw_out(got), want.numpy(), 2e-4, "spatial write out")
    assert_close(bank_g, bank_w.numpy(), 2e-4, "bank")

    want_r, _ = tm(x, ctx, ref=ref)
    got_r, _ = fm.apply(
        {"params": params}, nhwc(x), jnp.asarray(ctx.numpy()),
        ref=jnp.asarray(ref.numpy()),
    )
    assert_close(nchw_out(got_r), want_r.numpy(), 2e-4, "spatial read out")


@no_grad_test
def test_motion_module_parity():
    tm = TVanillaTemporalModule(64, heads=4, max_len=32)
    # non-zero proj_out (real checkpoints are trained past the zero init)
    torch.nn.init.normal_(tm.temporal_transformer.proj_out.weight, std=0.1)
    torch.nn.init.normal_(tm.temporal_transformer.proj_out.bias, std=0.1)
    B, T, C, H, W = 2, 6, 64, 4, 4
    x = torch.randn(B, C, T, H, W)
    want = tm(x)

    sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
    params = {}
    convert._convert_motion_module(sd, "m", params, ())
    fm = MotionModule(C, heads=4, max_len=32)
    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())  # (B,T,H,W,C)
    got = fm.apply({"params": params}, xj)
    want_j = want.permute(0, 2, 3, 4, 1).numpy()
    assert_close(got, want_j, 2e-4, "motion module")


@no_grad_test
def test_man_parity():
    tm = TMANModule(64)
    x = torch.randn(2, 64, 8, 8)
    m = torch.randn(2, 2, 5, 7)  # non-divisible resize, exercises index math
    want = tm(x, m)

    sd = {f"man.{k}": v for k, v in tm.state_dict().items()}
    params = {}
    convert._convert_man(sd, "man", params, ())
    fm = MANBlock()
    got = fm.apply({"params": params}, nhwc(x), jnp.asarray(m.permute(0, 2, 3, 1).numpy()))
    assert_close(nchw_out(got), want.numpy(), 2e-4, "MAN")


@no_grad_test
def test_tiny_guidance_unet_parity():
    ch = TINY.block_out_channels
    tm = TUNet(ch, 2, 4, 768, in_ch=20, man=True)
    B, H, W = 1, 16, 16
    x = torch.randn(B, 20, H, W)
    mmap = torch.randn(B, 2, H, W)
    t = torch.zeros(B)
    ctx = torch.randn(B, 5, 768)
    _, want_banks = tm(x, t, ctx, motion_map=mmap, write=True)

    params = convert.convert_unet(tm.state_dict(), with_man=True, with_conv_out=False)
    fm = GuidanceUNet(GuidanceUNetConfig(unet=TINY, use_man=True))
    got_banks = jax.jit(
        lambda p, *a: fm.apply(p, *a)
    )({"params": params}, nhwc(x), nhwc(mmap), jnp.zeros((B,), jnp.int32),
      jnp.asarray(ctx.numpy()))

    assert set(got_banks) == set(want_banks) == set(bank_keys(TINY))
    for k in got_banks:
        assert_close(got_banks[k], want_banks[k].numpy(), 5e-4, f"guidance bank {k}")


@no_grad_test
def test_tiny_denoising_unet_parity():
    ch = TINY.block_out_channels
    tm = TUNet(ch, 2, 4, 768, in_ch=4, motion=True)
    # non-zero motion proj_out everywhere
    for name, p in tm.named_parameters():
        if "proj_out" in name and "temporal_transformer" in name:
            torch.nn.init.normal_(p, std=0.05)
    B, T, H, W = 1, 2, 16, 16
    x = torch.randn(B * T, 4, H, W)
    t = torch.full((B,), 500.0)
    ctx = torch.randn(B, 5, 768)

    # banks at every spatial transformer position
    sizes = {}
    hw = H * W
    for i in range(3):
        sizes[f"down_{i}"] = (hw // (4**i), ch[i])
    sizes["mid"] = (hw // 64, ch[3])
    for i in range(1, 4):
        sizes[f"up_{i}"] = (hw // (4 ** (3 - i)), ch[3 - i])
    banks_t, banks_j = {}, {}
    g = torch.Generator().manual_seed(7)
    for k in bank_keys(TINY):
        base = "mid" if k == "mid" else k.rsplit("_", 1)[0]
        s, c = sizes[base]
        b = torch.randn(B * T, s, c, generator=g)
        banks_t[k] = b
        banks_j[k] = jnp.asarray(b.numpy())

    want, _ = tm(x, t, ctx, banks=banks_t, T=T)

    params = convert.convert_unet(tm.state_dict(), with_motion=True)
    fm = DenoisingUNet(
        DenoisingUNetConfig(unet=TINY, motion=MotionModuleConfig(num_attention_heads=4)))
    xj = nhwc(x).reshape(B, T, H, W, 4)
    got = jax.jit(lambda p, *a: fm.apply(p, *a))(
        {"params": params}, xj, jnp.full((B,), 500, jnp.int32),
        jnp.asarray(ctx.numpy()), banks_j)
    got = nchw_out(np.asarray(got).reshape(B * T, H, W, 4))
    assert_close(got, want.numpy(), 1e-3, "denoising unet")


@no_grad_test
def test_context_windows_match_reference():
    spec = importlib.util.spec_from_file_location(
        "ref_context", "/root/reference/src/pipelines/context.py")
    ref_ctx = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_ctx)

    from mikudance_tpu.pipelines.context import uniform_windows

    for num_frames in (16, 30, 31, 64, 77, 120):
        for size, overlap, stride in ((30, 8, 1), (16, 4, 1), (24, 8, 2)):
            for step in (0, 1, 5):
                want = list(ref_ctx.uniform(
                    step=step, num_steps=20, num_frames=num_frames,
                    context_size=size, context_stride=stride,
                    context_overlap=overlap))
                got = uniform_windows(
                    step, num_frames, size, context_stride=stride,
                    context_overlap=overlap)
                assert got == [list(w) for w in want], (
                    f"windows differ at T={num_frames} size={size} "
                    f"overlap={overlap} stride={stride} step={step}")
