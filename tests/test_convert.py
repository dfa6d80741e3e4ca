"""Weight-converter tests.

1. Primitive layout parity vs torch (conv HWIO transpose, padding semantics,
   dense transpose, norms) — catches any wrong axis order at the op level.
2. Structural round trip: emit a synthetic torch-style state dict from a
   Flax param tree via the inverse mapping, convert it back, require exact
   equality and full key coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mikudance_tpu.core import convert as cv
from mikudance_tpu.core.configs import (
    DenoisingUNetConfig,
    GuidanceUNetConfig,
    MotionModuleConfig,
    UNetConfig,
    VAEConfig,
)
from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet
from mikudance_tpu.models.vae import Decoder, Encoder

TINY = UNetConfig(block_out_channels=(32, 64, 96, 96), attention_heads=4)


# ---------------------------------------------------------------- primitives
def test_conv3x3_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 9, 11, 5)).astype(np.float32)
    tconv = torch.nn.Conv2d(5, 7, 3, padding=1)
    want = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()

    from mikudance_tpu.models.resnet import conv3x3
    m = conv3x3(7)
    params = {"params": {"kernel": jnp.asarray(cv.conv_kernel(tconv.weight)),
                         "bias": jnp.asarray(cv._t(tconv.bias))}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_strided_conv_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1)
    want = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()

    from mikudance_tpu.models.resnet import conv3x3
    m = conv3x3(6, stride=2)
    params = {"params": {"kernel": jnp.asarray(cv.conv_kernel(tconv.weight)),
                         "bias": jnp.asarray(cv._t(tconv.bias))}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 8, 8, 6)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_vae_downsample_asymmetric_padding_matches_torch():
    """The VAE downsampler pads (0,1,0,1) then convs stride 2 w/o padding."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=0)
    xt = torch.nn.functional.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (0, 1, 0, 1))
    want = tconv(xt).permute(0, 2, 3, 1).detach().numpy()

    from mikudance_tpu.models.vae import VAEDownsample
    m = VAEDownsample(6)
    params = {"params": {"conv": {"kernel": jnp.asarray(cv.conv_kernel(tconv.weight)),
                                  "bias": jnp.asarray(cv._t(tconv.bias))}}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_groupnorm_layernorm_match_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    tgn = torch.nn.GroupNorm(4, 16, eps=1e-6)
    torch.nn.init.normal_(tgn.weight); torch.nn.init.normal_(tgn.bias)
    want = tgn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    import flax.linen as nn
    gn = nn.GroupNorm(4, epsilon=1e-6)
    params = {"params": {"scale": jnp.asarray(cv._t(tgn.weight)), "bias": jnp.asarray(cv._t(tgn.bias))}}
    got = np.asarray(gn.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)

    tln = torch.nn.LayerNorm(16)
    torch.nn.init.normal_(tln.weight); torch.nn.init.normal_(tln.bias)
    want = tln(torch.from_numpy(x)).detach().numpy()
    ln = nn.LayerNorm(epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(cv._t(tln.weight)), "bias": jnp.asarray(cv._t(tln.bias))}}
    got = np.asarray(ln.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_attention_matches_torch_sdpa():
    """Our multi-head attention == torch scaled_dot_product_attention."""
    from mikudance_tpu.models.layers import dot_product_attention
    rng = np.random.default_rng(4)
    B, S, C, H = 2, 10, 32, 4
    q, k, v = (rng.normal(size=(B, S, C)).astype(np.float32) for _ in range(3))
    got = np.asarray(dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H))
    tq = torch.from_numpy(q).view(B, S, H, C // H).transpose(1, 2)
    tk = torch.from_numpy(k).view(B, S, H, C // H).transpose(1, 2)
    tv = torch.from_numpy(v).view(B, S, H, C // H).transpose(1, 2)
    want = (
        torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
        .transpose(1, 2).reshape(B, S, C).numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


# ------------------------------------------------------- structural roundtrip
def _flax_path_to_torch_key(path):
    """Inverse of the converter's naming map (test-side oracle)."""
    parts = [str(getattr(p, "key", p)) for p in path]
    leaf = parts[-1]
    mods = parts[:-1]

    def block_prefix(tok):
        # down_0_res_1 -> down_blocks.0.resnets.1, etc.
        import re
        m = re.match(r"(down|up)_(\d)_(res|attn|motion)_(\d)", tok)
        if m:
            kind = {"res": "resnets", "attn": "attentions", "motion": "motion_modules"}[m[3]]
            return f"{m[1]}_blocks.{m[2]}.{kind}.{m[4]}"
        m = re.match(r"(down|up)_(\d)_(down|up)$", tok)
        if m:
            kind = "downsamplers.0" if m[3] == "down" else "upsamplers.0"
            return f"{m[1]}_blocks.{m[2]}.{kind}"
        if tok == "mid_res_0":
            return "mid_block.resnets.0"
        if tok == "mid_res_1":
            return "mid_block.resnets.1"
        if tok == "mid_attn":
            return "mid_block.attentions.0"
        if tok == "mid_motion":
            return "mid_block.motion_modules.0"
        m = re.match(r"man_(\d)", tok)
        if m:
            return f"man_blocks.{m[1]}"
        return tok

    out = [block_prefix(mods[0])] if mods else []
    rest = mods[1:]
    i = 0
    while i < len(rest):
        tok = rest[i]
        if tok == "block":
            out.append("transformer_blocks.0")
        elif tok.startswith("blocks_"):  # motion module internals blocks_b_xxx
            import re
            m = re.match(r"blocks_(\d)_norm_(\d)", tok)
            if m:
                out.append(f"transformer_blocks.{m[1]}.norms.{m[2]}")
            m2 = re.match(r"blocks_(\d)_attn_(\d)", tok)
            if m2:
                out.append(f"transformer_blocks.{m2[1]}.attention_blocks.{m2[2]}")
                i += 1  # skip following "attn"
            m3 = re.match(r"blocks_(\d)_ff_norm", tok)
            if m3:
                out.append(f"transformer_blocks.{m3[1]}.ff_norm")
            m4 = re.match(r"blocks_(\d)_ff$", tok)
            if m4:
                out.append(f"transformer_blocks.{m4[1]}.ff")
        elif tok == "ff":
            out.append("ff")
        elif tok == "proj" and out and out[-1].endswith("ff"):
            out.append("net.0.proj")
        elif tok == "out" and out and out[-1].endswith("ff"):
            out.append("net.2")
        elif tok == "to_out":
            out.append("to_out.0")
        elif tok == "mlp_shared":
            out.append("mlp_shared.0")
        else:
            out.append(tok)
        i += 1

    # motion modules live under .temporal_transformer
    if mods and "motion" in mods[0]:
        out.insert(1, "temporal_transformer")

    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    return ".".join(out + [suffix])


def _inverse_leaf(path, arr):
    """flax leaf -> torch-layout array."""
    a = np.asarray(arr)
    parts = [str(getattr(p, "key", p)) for p in path]
    leaf = parts[-1]
    if leaf != "kernel":
        return a
    if a.ndim == 4:  # conv HWIO -> OIHW
        return a.transpose(3, 2, 0, 1)
    if a.ndim == 2:
        name = parts[-2]
        if name in ("proj_in", "proj_out") and "attn" in parts[0]:
            return a.T[:, :, None, None]  # dense back to 1x1 conv
        return a.T
    return a


@pytest.mark.parametrize("model", ["guidance", "denoising"])
def test_unet_converter_roundtrip(model):
    if model == "guidance":
        net = GuidanceUNet(GuidanceUNetConfig(unet=TINY, use_man=True))
        p = jax.jit(net.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 20)), jnp.zeros((1, 8, 8, 2)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 768)),
        )["params"]
        kwargs = dict(with_man=True, with_conv_out=False)
    else:
        net = DenoisingUNet(
            DenoisingUNetConfig(unet=TINY, motion=MotionModuleConfig(num_attention_heads=4))
        )
        p = jax.jit(net.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 5, 768)),
        )["params"]
        kwargs = dict(with_motion=True)

    flat = jax.tree_util.tree_flatten_with_path(p)[0]
    rng = np.random.default_rng(0)
    src = {}
    for path, leaf in flat:
        key = _flax_path_to_torch_key(path)
        assert key not in src, f"duplicate torch key {key}"
        src[key] = _inverse_leaf(path, rng.normal(size=np.shape(leaf)).astype(np.float32))

    out = cv.convert_unet(src, **kwargs)
    got_flat = jax.tree_util.tree_flatten_with_path(out)[0]
    got = {tuple(str(getattr(k, "key", k)) for k in pth): v for pth, v in got_flat}
    want = {tuple(str(getattr(k, "key", k)) for k in pth): v for pth, v in flat}
    assert set(got.keys()) == set(want.keys()), (
        f"missing: {sorted(set(want) - set(got))[:5]} extra: {sorted(set(got) - set(want))[:5]}"
    )
    for k in want:
        assert got[k].shape == np.shape(want[k]), f"{k}: {got[k].shape} vs {np.shape(want[k])}"
        # value check: converting the inverse gives back the original sample
        src_key = _flax_path_to_torch_key(
            jax.tree_util.tree_flatten_with_path(p)[0][0][0]
        )
    # spot value equality on all leaves
    for path, leaf in flat:
        key = tuple(str(getattr(k, "key", k)) for k in path)
        inv = _inverse_leaf(path, got[key])
        np.testing.assert_array_equal(inv, src[_flax_path_to_torch_key(path)])


def test_zero_pad_conv_in():
    tree = {"conv_in": {"kernel": np.ones((3, 3, 4, 8), np.float32)}}
    out = cv.zero_pad_conv_in(tree, 20)
    k = out["conv_in"]["kernel"]
    assert k.shape == (3, 3, 20, 8)
    assert (k[:, :, :4] == 1).all() and (k[:, :, 4:] == 0).all()
