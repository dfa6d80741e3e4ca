"""PyTorch-checkpoint -> Flax parameter-tree converter.

Maps the reference's released ``.pth`` state dicts (diffusers UNet / VAE /
HF CLIP key names — see `/root/reference/tools/download_weights.py:6-104` for
the checkpoint set and `unet_3d_mix.py:600-691` for the load-time merge
semantics) onto this package's param trees.

Transform rules:
- Conv2d weight (O, I, kh, kw) -> HWIO kernel (kh, kw, I, O)
- 1x1-conv projections that became Dense here (spatial transformer
  proj_in/proj_out) -> squeeze spatial dims, transpose to (I, O)
- Linear weight (O, I) -> kernel (I, O)
- Norm weight -> scale
- 3D "inflated" convs (`resnet.py:9-17`) carry 2D kernels; identical mapping.

Weight-surgery helpers mirror the reference's from_unet/from_pretrained_2d
conversions: conv_in zero-padding to 20 channels (`unet_2d_mix.py:896-920`)
and motion-module dict merge (`unet_3d_mix.py:637-684`).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor / array -> numpy float32 array."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def conv_kernel(x) -> np.ndarray:
    return _t(x).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def dense_kernel(x) -> np.ndarray:
    return _t(x).T  # (O, I) -> (I, O)


def conv1x1_as_dense(x) -> np.ndarray:
    a = _t(x)
    if a.ndim == 4:  # (O, I, 1, 1)
        a = a[:, :, 0, 0]
    return a.T


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


# --------------------------------------------------------------------------
# sub-tree converters (shared between the UNets)
# --------------------------------------------------------------------------

def _convert_resnet(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    m = {
        "norm1.weight": ("norm1", "scale", _t),
        "norm1.bias": ("norm1", "bias", _t),
        "conv1.weight": ("conv1", "kernel", conv_kernel),
        "conv1.bias": ("conv1", "bias", _t),
        "time_emb_proj.weight": ("time_emb_proj", "kernel", dense_kernel),
        "time_emb_proj.bias": ("time_emb_proj", "bias", _t),
        "norm2.weight": ("norm2", "scale", _t),
        "norm2.bias": ("norm2", "bias", _t),
        "conv2.weight": ("conv2", "kernel", conv_kernel),
        "conv2.bias": ("conv2", "bias", _t),
        "conv_shortcut.weight": ("conv_shortcut", "kernel", conv_kernel),
        "conv_shortcut.bias": ("conv_shortcut", "bias", _t),
    }
    for k, (sub, leaf, fn) in m.items():
        key = f"{prefix}.{k}"
        if key in src:
            _set(out, dst + (sub, leaf), fn(src[key]))


def _convert_attention(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    """diffusers Attention: to_q/k/v (no bias) + to_out.0 (bias)."""
    for name in ("to_q", "to_k", "to_v"):
        _set(out, dst + (name, "kernel"), dense_kernel(src[f"{prefix}.{name}.weight"]))
    _set(out, dst + ("to_out", "kernel"), dense_kernel(src[f"{prefix}.to_out.0.weight"]))
    _set(out, dst + ("to_out", "bias"), _t(src[f"{prefix}.to_out.0.bias"]))


def _convert_transformer_block(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    """(Temporal)BasicTransformerBlock -> TransformerBlock."""
    for n in ("norm1", "norm2", "norm3"):
        _set(out, dst + (n, "scale"), _t(src[f"{prefix}.{n}.weight"]))
        _set(out, dst + (n, "bias"), _t(src[f"{prefix}.{n}.bias"]))
    _convert_attention(src, f"{prefix}.attn1", out, dst + ("attn1",))
    _convert_attention(src, f"{prefix}.attn2", out, dst + ("attn2",))
    _set(out, dst + ("ff", "proj", "kernel"), dense_kernel(src[f"{prefix}.ff.net.0.proj.weight"]))
    _set(out, dst + ("ff", "proj", "bias"), _t(src[f"{prefix}.ff.net.0.proj.bias"]))
    _set(out, dst + ("ff", "out", "kernel"), dense_kernel(src[f"{prefix}.ff.net.2.weight"]))
    _set(out, dst + ("ff", "out", "bias"), _t(src[f"{prefix}.ff.net.2.bias"]))


def _convert_spatial_transformer(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    """Transformer2DModel/3D -> SpatialTransformer (1x1 convs become Dense)."""
    _set(out, dst + ("norm", "scale"), _t(src[f"{prefix}.norm.weight"]))
    _set(out, dst + ("norm", "bias"), _t(src[f"{prefix}.norm.bias"]))
    _set(out, dst + ("proj_in", "kernel"), conv1x1_as_dense(src[f"{prefix}.proj_in.weight"]))
    _set(out, dst + ("proj_in", "bias"), _t(src[f"{prefix}.proj_in.bias"]))
    _convert_transformer_block(src, f"{prefix}.transformer_blocks.0", out, dst + ("block",))
    _set(out, dst + ("proj_out", "kernel"), conv1x1_as_dense(src[f"{prefix}.proj_out.weight"]))
    _set(out, dst + ("proj_out", "bias"), _t(src[f"{prefix}.proj_out.bias"]))


def _convert_motion_module(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    """motion_modules.{j}.temporal_transformer -> MotionModule."""
    p = f"{prefix}.temporal_transformer"
    _set(out, dst + ("norm", "scale"), _t(src[f"{p}.norm.weight"]))
    _set(out, dst + ("norm", "bias"), _t(src[f"{p}.norm.bias"]))
    _set(out, dst + ("proj_in", "kernel"), dense_kernel(src[f"{p}.proj_in.weight"]))
    _set(out, dst + ("proj_in", "bias"), _t(src[f"{p}.proj_in.bias"]))
    _set(out, dst + ("proj_out", "kernel"), dense_kernel(src[f"{p}.proj_out.weight"]))
    _set(out, dst + ("proj_out", "bias"), _t(src[f"{p}.proj_out.bias"]))
    for b in range(8):  # num transformer blocks (config uses 1)
        bp = f"{p}.transformer_blocks.{b}"
        if f"{bp}.ff_norm.weight" not in src:
            break
        for a in range(8):  # attention layers per block (config uses 2)
            ap = f"{bp}.attention_blocks.{a}"
            if f"{ap}.to_q.weight" not in src:
                break
            _set(out, dst + (f"blocks_{b}_norm_{a}", "scale"), _t(src[f"{bp}.norms.{a}.weight"]))
            _set(out, dst + (f"blocks_{b}_norm_{a}", "bias"), _t(src[f"{bp}.norms.{a}.bias"]))
            _convert_attention(src, ap, out, dst + (f"blocks_{b}_attn_{a}", "attn"))
        _set(out, dst + (f"blocks_{b}_ff_norm", "scale"), _t(src[f"{bp}.ff_norm.weight"]))
        _set(out, dst + (f"blocks_{b}_ff_norm", "bias"), _t(src[f"{bp}.ff_norm.bias"]))
        _set(out, dst + (f"blocks_{b}_ff", "proj", "kernel"), dense_kernel(src[f"{bp}.ff.net.0.proj.weight"]))
        _set(out, dst + (f"blocks_{b}_ff", "proj", "bias"), _t(src[f"{bp}.ff.net.0.proj.bias"]))
        _set(out, dst + (f"blocks_{b}_ff", "out", "kernel"), dense_kernel(src[f"{bp}.ff.net.2.weight"]))
        _set(out, dst + (f"blocks_{b}_ff", "out", "bias"), _t(src[f"{bp}.ff.net.2.bias"]))


def _convert_man(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    _set(out, dst + ("mlp_shared", "kernel"), conv_kernel(src[f"{prefix}.mlp_shared.0.weight"]))
    _set(out, dst + ("mlp_shared", "bias"), _t(src[f"{prefix}.mlp_shared.0.bias"]))
    for n in ("mlp_gamma", "mlp_beta"):
        _set(out, dst + (n, "kernel"), conv_kernel(src[f"{prefix}.{n}.weight"]))
        _set(out, dst + (n, "bias"), _t(src[f"{prefix}.{n}.bias"]))


# --------------------------------------------------------------------------
# whole-model converters
# --------------------------------------------------------------------------

def convert_unet(
    src: Mapping, num_blocks: int = 4, layers_per_block: int = 2,
    with_motion: bool = False, with_man: bool = False, with_conv_out: bool = True,
) -> Dict:
    """diffusers-UNet-style state dict -> GuidanceUNet / DenoisingUNet params."""
    out: Dict[str, Any] = {}
    _set(out, ("conv_in", "kernel"), conv_kernel(src["conv_in.weight"]))
    _set(out, ("conv_in", "bias"), _t(src["conv_in.bias"]))
    for i in (1, 2):
        _set(out, ("time_embedding", f"linear_{i}", "kernel"),
             dense_kernel(src[f"time_embedding.linear_{i}.weight"]))
        _set(out, ("time_embedding", f"linear_{i}", "bias"),
             _t(src[f"time_embedding.linear_{i}.bias"]))

    for i in range(num_blocks):
        has_attn = i < num_blocks - 1
        for j in range(layers_per_block):
            _convert_resnet(src, f"down_blocks.{i}.resnets.{j}", out, (f"down_{i}_res_{j}",))
            if has_attn:
                _convert_spatial_transformer(
                    src, f"down_blocks.{i}.attentions.{j}", out, (f"down_{i}_attn_{j}",))
            if with_motion and f"down_blocks.{i}.motion_modules.{j}.temporal_transformer.norm.weight" in src:
                _convert_motion_module(
                    src, f"down_blocks.{i}.motion_modules.{j}", out, (f"down_{i}_motion_{j}",))
        if i < num_blocks - 1:
            _set(out, (f"down_{i}_down", "conv", "kernel"),
                 conv_kernel(src[f"down_blocks.{i}.downsamplers.0.conv.weight"]))
            _set(out, (f"down_{i}_down", "conv", "bias"),
                 _t(src[f"down_blocks.{i}.downsamplers.0.conv.bias"]))
        if with_man and f"man_blocks.{i}.mlp_gamma.weight" in src:
            _convert_man(src, f"man_blocks.{i}", out, (f"man_{i}",))

    _convert_resnet(src, "mid_block.resnets.0", out, ("mid_res_0",))
    _convert_spatial_transformer(src, "mid_block.attentions.0", out, ("mid_attn",))
    _convert_resnet(src, "mid_block.resnets.1", out, ("mid_res_1",))
    if with_motion and "mid_block.motion_modules.0.temporal_transformer.norm.weight" in src:
        _convert_motion_module(src, "mid_block.motion_modules.0", out, ("mid_motion",))

    for i in range(num_blocks):
        has_attn = i > 0
        for j in range(layers_per_block + 1):
            _convert_resnet(src, f"up_blocks.{i}.resnets.{j}", out, (f"up_{i}_res_{j}",))
            if has_attn:
                _convert_spatial_transformer(
                    src, f"up_blocks.{i}.attentions.{j}", out, (f"up_{i}_attn_{j}",))
            if with_motion and f"up_blocks.{i}.motion_modules.{j}.temporal_transformer.norm.weight" in src:
                _convert_motion_module(
                    src, f"up_blocks.{i}.motion_modules.{j}", out, (f"up_{i}_motion_{j}",))
        if i < num_blocks - 1:
            _set(out, (f"up_{i}_up", "conv", "kernel"),
                 conv_kernel(src[f"up_blocks.{i}.upsamplers.0.conv.weight"]))
            _set(out, (f"up_{i}_up", "conv", "bias"),
                 _t(src[f"up_blocks.{i}.upsamplers.0.conv.bias"]))

    if with_conv_out and "conv_out.weight" in src:
        _set(out, ("conv_norm_out", "scale"), _t(src["conv_norm_out.weight"]))
        _set(out, ("conv_norm_out", "bias"), _t(src["conv_norm_out.bias"]))
        _set(out, ("conv_out", "kernel"), conv_kernel(src["conv_out.weight"]))
        _set(out, ("conv_out", "bias"), _t(src["conv_out.bias"]))
    return out


def _convert_vae_resnet(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    _convert_resnet(src, prefix, out, dst)  # same key set minus time_emb_proj


def _convert_vae_attention(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    _set(out, dst + ("group_norm", "scale"), _t(src[f"{prefix}.group_norm.weight"]))
    _set(out, dst + ("group_norm", "bias"), _t(src[f"{prefix}.group_norm.bias"]))
    for n in ("to_q", "to_k", "to_v"):
        _set(out, dst + (n, "kernel"), dense_kernel(src[f"{prefix}.{n}.weight"]))
        _set(out, dst + (n, "bias"), _t(src[f"{prefix}.{n}.bias"]))
    _set(out, dst + ("to_out", "kernel"), dense_kernel(src[f"{prefix}.to_out.0.weight"]))
    _set(out, dst + ("to_out", "bias"), _t(src[f"{prefix}.to_out.0.bias"]))


def convert_vae_encoder(src: Mapping, num_blocks: int = 4, layers_per_block: int = 2) -> Dict:
    out: Dict[str, Any] = {}
    _set(out, ("conv_in", "kernel"), conv_kernel(src["encoder.conv_in.weight"]))
    _set(out, ("conv_in", "bias"), _t(src["encoder.conv_in.bias"]))
    for i in range(num_blocks):
        for j in range(layers_per_block):
            _convert_vae_resnet(src, f"encoder.down_blocks.{i}.resnets.{j}", out, (f"down_{i}_res_{j}",))
        if i < num_blocks - 1:
            _set(out, (f"down_{i}_down", "conv", "kernel"),
                 conv_kernel(src[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"]))
            _set(out, (f"down_{i}_down", "conv", "bias"),
                 _t(src[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"]))
    _convert_vae_resnet(src, "encoder.mid_block.resnets.0", out, ("mid_res_0",))
    _convert_vae_attention(src, "encoder.mid_block.attentions.0", out, ("mid_attn",))
    _convert_vae_resnet(src, "encoder.mid_block.resnets.1", out, ("mid_res_1",))
    _set(out, ("conv_norm_out", "scale"), _t(src["encoder.conv_norm_out.weight"]))
    _set(out, ("conv_norm_out", "bias"), _t(src["encoder.conv_norm_out.bias"]))
    _set(out, ("conv_out", "kernel"), conv_kernel(src["encoder.conv_out.weight"]))
    _set(out, ("conv_out", "bias"), _t(src["encoder.conv_out.bias"]))
    _set(out, ("quant_conv", "kernel"), conv_kernel(src["quant_conv.weight"]))
    _set(out, ("quant_conv", "bias"), _t(src["quant_conv.bias"]))
    return out


def convert_vae_decoder(src: Mapping, num_blocks: int = 4, layers_per_block: int = 2) -> Dict:
    out: Dict[str, Any] = {}
    _set(out, ("post_quant_conv", "kernel"), conv_kernel(src["post_quant_conv.weight"]))
    _set(out, ("post_quant_conv", "bias"), _t(src["post_quant_conv.bias"]))
    _set(out, ("conv_in", "kernel"), conv_kernel(src["decoder.conv_in.weight"]))
    _set(out, ("conv_in", "bias"), _t(src["decoder.conv_in.bias"]))
    _convert_vae_resnet(src, "decoder.mid_block.resnets.0", out, ("mid_res_0",))
    _convert_vae_attention(src, "decoder.mid_block.attentions.0", out, ("mid_attn",))
    _convert_vae_resnet(src, "decoder.mid_block.resnets.1", out, ("mid_res_1",))
    for i in range(num_blocks):
        for j in range(layers_per_block + 1):
            _convert_vae_resnet(src, f"decoder.up_blocks.{i}.resnets.{j}", out, (f"up_{i}_res_{j}",))
        if i < num_blocks - 1:
            _set(out, (f"up_{i}_up", "conv", "kernel"),
                 conv_kernel(src[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"]))
            _set(out, (f"up_{i}_up", "conv", "bias"),
                 _t(src[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"]))
    _set(out, ("conv_norm_out", "scale"), _t(src["decoder.conv_norm_out.weight"]))
    _set(out, ("conv_norm_out", "bias"), _t(src["decoder.conv_norm_out.bias"]))
    _set(out, ("conv_out", "kernel"), conv_kernel(src["decoder.conv_out.weight"]))
    _set(out, ("conv_out", "bias"), _t(src["decoder.conv_out.bias"]))
    return out


def convert_clip_vision(src: Mapping, num_layers: int = 24) -> Dict:
    out: Dict[str, Any] = {}
    _set(out, ("class_embedding",), _t(src["vision_model.embeddings.class_embedding"]))
    _set(out, ("patch_embedding", "kernel"),
         conv_kernel(src["vision_model.embeddings.patch_embedding.weight"]))
    _set(out, ("position_embedding",), _t(src["vision_model.embeddings.position_embedding.weight"]))
    for n, d in (("pre_layrnorm", "pre_layrnorm"), ("post_layernorm", "post_layernorm")):
        _set(out, (d, "scale"), _t(src[f"vision_model.{n}.weight"]))
        _set(out, (d, "bias"), _t(src[f"vision_model.{n}.bias"]))
    for i in range(num_layers):
        p = f"vision_model.encoder.layers.{i}"
        d = f"layers_{i}"
        for n in ("layer_norm1", "layer_norm2"):
            _set(out, (d, n, "scale"), _t(src[f"{p}.{n}.weight"]))
            _set(out, (d, n, "bias"), _t(src[f"{p}.{n}.bias"]))
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(out, (d, n, "kernel"), dense_kernel(src[f"{p}.self_attn.{n}.weight"]))
            _set(out, (d, n, "bias"), _t(src[f"{p}.self_attn.{n}.bias"]))
        for n in ("fc1", "fc2"):
            _set(out, (d, n, "kernel"), dense_kernel(src[f"{p}.mlp.{n}.weight"]))
            _set(out, (d, n, "bias"), _t(src[f"{p}.mlp.{n}.bias"]))
    _set(out, ("visual_projection", "kernel"), dense_kernel(src["visual_projection.weight"]))
    return out


# --------------------------------------------------------------------------
# weight surgery (reference load-time conversions)
# --------------------------------------------------------------------------

def zero_pad_conv_in(src: Dict, new_in_channels: int) -> Dict:
    """SD 4-ch conv_in -> N-ch with zero-padded extra input channels
    (`unet_2d_mix.py:904-907`). Operates on a converted flax tree."""
    k = src["conv_in"]["kernel"]  # (3, 3, 4, 320)
    kh, kw, old_in, out_ch = k.shape
    nk = np.zeros((kh, kw, new_in_channels, out_ch), k.dtype)
    nk[:, :, :old_in] = k
    src["conv_in"]["kernel"] = nk
    return src


def merge_state_dicts(base: Mapping, extra: Mapping) -> Dict:
    """strict=False-style merge: extra keys override base
    (`unet_3d_mix.py:637-684` motion-module merge)."""
    out = dict(base)
    out.update(extra)
    return out


def conv_temporal_kernel(x) -> np.ndarray:
    """torch Conv3d (O, I, 3, 1, 1) -> flax (3, 1, I, O)."""
    a = _t(x)[:, :, :, 0, :]  # (O, I, 3, 1)
    return a.transpose(2, 3, 1, 0)


def _convert_st_resblock(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    """SpatioTemporalResBlock -> spatial_* + temporal_res_block + mix_factor."""
    sp = f"{prefix}.spatial_res_block"
    m = {
        "norm1.weight": ("spatial_norm1", "scale", _t),
        "norm1.bias": ("spatial_norm1", "bias", _t),
        "conv1.weight": ("spatial_conv1", "kernel", conv_kernel),
        "conv1.bias": ("spatial_conv1", "bias", _t),
        "norm2.weight": ("spatial_norm2", "scale", _t),
        "norm2.bias": ("spatial_norm2", "bias", _t),
        "conv2.weight": ("spatial_conv2", "kernel", conv_kernel),
        "conv2.bias": ("spatial_conv2", "bias", _t),
        "conv_shortcut.weight": ("spatial_conv_shortcut", "kernel", conv_kernel),
        "conv_shortcut.bias": ("spatial_conv_shortcut", "bias", _t),
    }
    for k, (sub, leaf, fn) in m.items():
        key = f"{sp}.{k}"
        if key in src:
            _set(out, dst + (sub, leaf), fn(src[key]))
    tp = f"{prefix}.temporal_res_block"
    for n in ("norm1", "norm2"):
        _set(out, dst + ("temporal_res_block", n, "scale"), _t(src[f"{tp}.{n}.weight"]))
        _set(out, dst + ("temporal_res_block", n, "bias"), _t(src[f"{tp}.{n}.bias"]))
    for n in ("conv1", "conv2"):
        _set(out, dst + ("temporal_res_block", n, "conv", "kernel"),
             conv_temporal_kernel(src[f"{tp}.{n}.weight"]))
        _set(out, dst + ("temporal_res_block", n, "conv", "bias"), _t(src[f"{tp}.{n}.bias"]))
    _set(out, dst + ("mix_factor",), _t(src[f"{prefix}.time_mixer.mix_factor"]).reshape(1))


def convert_temporal_decoder(src: Mapping, num_blocks: int = 4, layers_per_block: int = 2) -> Dict:
    """AutoencoderKLTemporalDecoder 'decoder.*' keys -> TemporalDecoder params."""
    out: Dict[str, Any] = {}
    _set(out, ("conv_in", "kernel"), conv_kernel(src["decoder.conv_in.weight"]))
    _set(out, ("conv_in", "bias"), _t(src["decoder.conv_in.bias"]))
    _convert_st_resblock(src, "decoder.mid_block.resnets.0", out, ("mid_res_0",))
    _convert_vae_attention(src, "decoder.mid_block.attentions.0", out, ("mid_attn",))
    _convert_st_resblock(src, "decoder.mid_block.resnets.1", out, ("mid_res_1",))
    for i in range(num_blocks):
        for j in range(layers_per_block + 1):
            _convert_st_resblock(src, f"decoder.up_blocks.{i}.resnets.{j}", out,
                                 (f"up_{i}_res_{j}",))
        if i < num_blocks - 1:
            _set(out, (f"up_{i}_up", "conv", "kernel"),
                 conv_kernel(src[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"]))
            _set(out, (f"up_{i}_up", "conv", "bias"),
                 _t(src[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"]))
    _set(out, ("conv_norm_out", "scale"), _t(src["decoder.conv_norm_out.weight"]))
    _set(out, ("conv_norm_out", "bias"), _t(src["decoder.conv_norm_out.bias"]))
    _set(out, ("conv_out", "kernel"), conv_kernel(src["decoder.conv_out.weight"]))
    _set(out, ("conv_out", "bias"), _t(src["decoder.conv_out.bias"]))
    # time_conv_out lives inside the decoder module in diffusers'
    # AutoencoderKLTemporalDecoder; accept a pre-stripped dict too.
    tk = "decoder.time_conv_out" if "decoder.time_conv_out.weight" in src else "time_conv_out"
    _set(out, ("time_conv_out", "conv", "kernel"),
         conv_temporal_kernel(src[f"{tk}.weight"]))
    _set(out, ("time_conv_out", "conv", "bias"), _t(src[f"{tk}.bias"]))
    return out


# --------------------------------------------------------------------------
# UniPose (XPose) checkpoint converter
# --------------------------------------------------------------------------

def _convert_ln(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    _set(out, dst + ("scale",), _t(src[f"{prefix}.weight"]))
    _set(out, dst + ("bias",), _t(src[f"{prefix}.bias"]))


def _convert_dense(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    _set(out, dst + ("kernel",), dense_kernel(src[f"{prefix}.weight"]))
    if f"{prefix}.bias" in src:
        _set(out, dst + ("bias",), _t(src[f"{prefix}.bias"]))


def _convert_mha(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    """torch nn.MultiheadAttention packed in_proj -> q/k/v/out Dense."""
    w = _t(src[f"{prefix}.in_proj_weight"])  # (3C, C)
    b = _t(src[f"{prefix}.in_proj_bias"])
    C = w.shape[1]
    for i, n in enumerate(("q_proj", "k_proj", "v_proj")):
        _set(out, dst + (n, "kernel"), w[i * C:(i + 1) * C].T)
        _set(out, dst + (n, "bias"), b[i * C:(i + 1) * C])
    _convert_dense(src, f"{prefix}.out_proj", out, dst + ("out_proj",))


def _convert_mlp(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...],
                 num_layers: int = 3):
    for k in range(num_layers):
        _convert_dense(src, f"{prefix}.layers.{k}", out, dst + (f"layers_{k}",))


def _convert_deform_attn(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    for n in ("value_proj", "sampling_offsets", "attention_weights", "output_proj"):
        _convert_dense(src, f"{prefix}.{n}", out, dst + (n,))


def convert_swin(src: Mapping, prefix: str = "backbone.0",
                 depths: Tuple[int, ...] = (2, 2, 6, 2),
                 out_indices: Tuple[int, ...] = (1, 2, 3)) -> Dict:
    """Swin-T detection backbone (`swin_transformer.py:429+`) -> SwinTransformer."""
    out: Dict[str, Any] = {}
    _set(out, ("patch_embed", "kernel"), conv_kernel(src[f"{prefix}.patch_embed.proj.weight"]))
    _set(out, ("patch_embed", "bias"), _t(src[f"{prefix}.patch_embed.proj.bias"]))
    _convert_ln(src, f"{prefix}.patch_embed.norm", out, ("patch_norm",))
    for i, depth in enumerate(depths):
        for j in range(depth):
            bp = f"{prefix}.layers.{i}.blocks.{j}"
            dst = (f"stage_{i}_block_{j}",)
            _convert_ln(src, f"{bp}.norm1", out, dst + ("norm1",))
            _convert_ln(src, f"{bp}.norm2", out, dst + ("norm2",))
            _set(out, dst + ("attn", "relative_position_bias_table"),
                 _t(src[f"{bp}.attn.relative_position_bias_table"]))
            _convert_dense(src, f"{bp}.attn.qkv", out, dst + ("attn", "qkv"))
            _convert_dense(src, f"{bp}.attn.proj", out, dst + ("attn", "proj"))
            _convert_dense(src, f"{bp}.mlp.fc1", out, dst + ("fc1",))
            _convert_dense(src, f"{bp}.mlp.fc2", out, dst + ("fc2",))
        if i < len(depths) - 1:
            _convert_ln(src, f"{prefix}.layers.{i}.downsample.norm", out,
                        (f"merge_{i}", "norm"))
            _convert_dense(src, f"{prefix}.layers.{i}.downsample.reduction", out,
                           (f"merge_{i}", "reduction"))
    for k in out_indices:
        _convert_ln(src, f"{prefix}.norm{k}", out, (f"out_norm_{k}",))
    return out


def convert_unipose(src: Mapping, enc_layers: int = 6, dec_layers: int = 6,
                    num_levels: int = 4,
                    depths: Tuple[int, ...] = (2, 2, 6, 2),
                    out_indices: Tuple[int, ...] = (1, 2, 3)) -> Dict:
    """Released UniPose checkpoint (`unipose.py:505` build; keys as saved by
    the reference training, 'module.' prefix already stripped) -> the Flax
    ``toolbox.unipose.UniPose`` param tree.

    Skipped-by-design keys (dead at inference): label_enc, pos_proj, padding,
    clip_model.* (`unipose.py:421-426` multiplies them by 0.0), and the
    duplicate shared-head entries (bbox_embed.1..5, transformer.decoder.*_embed,
    transformer.enc_out_bbox_embed) which alias bbox_embed.0 tensors.
    """
    out: Dict[str, Any] = {}
    out["backbone"] = convert_swin(src, "backbone.0", depths, out_indices)

    for i in range(num_levels):
        _set(out, (f"input_proj_{i}", "kernel"), conv_kernel(src[f"input_proj.{i}.0.weight"]))
        _set(out, (f"input_proj_{i}", "bias"), _t(src[f"input_proj.{i}.0.bias"]))
        _convert_ln(src, f"input_proj.{i}.1", out, (f"input_proj_norm_{i}",))

    _set(out, ("level_embed",), _t(src["transformer.level_embed"]))
    _set(out, ("tgt_embed",), _t(src["transformer.tgt_embed.weight"]))
    _set(out, ("hw",), _t(src["transformer.decoder.hw.weight"]))
    _set(out, ("hw_append",), _t(src["transformer.decoder.hw_append.weight"]))
    _convert_dense(src, "transformer.enc_output", out, ("enc_output",))
    _convert_ln(src, "transformer.enc_output_norm", out, ("enc_output_norm",))
    _convert_ln(src, "transformer.decoder.norm", out, ("decoder_norm",))
    _convert_mlp(src, "transformer.decoder.ref_point_head", out,
                 ("ref_point_head",), num_layers=2)

    for i in range(enc_layers):
        ep = f"transformer.encoder.layers.{i}"
        _convert_deform_attn(src, f"{ep}.self_attn", out, (f"enc_{i}", "self_attn"))
        for n in ("norm1", "norm2"):
            _convert_ln(src, f"{ep}.{n}", out, (f"enc_{i}", n))
        for n in ("linear1", "linear2"):
            _convert_dense(src, f"{ep}.{n}", out, (f"enc_{i}", n))

        tp = f"transformer.encoder.text_layers.{i}"
        _convert_mha(src, f"{tp}.self_attn", out, (f"text_{i}", "self_attn"))
        for n in ("norm1", "norm2"):
            _convert_ln(src, f"{tp}.{n}", out, (f"text_{i}", n))
        for n in ("linear1", "linear2"):
            _convert_dense(src, f"{tp}.{n}", out, (f"text_{i}", n))

        fp = f"transformer.encoder.fusion_layers.{i}"
        _convert_ln(src, f"{fp}.layer_norm_v", out, (f"fusion_{i}", "layer_norm_v"))
        _convert_ln(src, f"{fp}.layer_norm_l", out, (f"fusion_{i}", "layer_norm_l"))
        for n in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                  "out_v_proj", "out_l_proj"):
            _convert_dense(src, f"{fp}.attn.{n}", out, (f"fusion_{i}", n))
        _set(out, (f"fusion_{i}", "gamma_v"), _t(src[f"{fp}.gamma_v"]))
        _set(out, (f"fusion_{i}", "gamma_l"), _t(src[f"{fp}.gamma_l"]))

    for i in range(dec_layers):
        dp = f"transformer.decoder.layers.{i}"
        _convert_deform_attn(src, f"{dp}.cross_attn", out, (f"dec_{i}", "cross_attn"))
        _convert_mha(src, f"{dp}.self_attn", out, (f"dec_{i}", "self_attn"))
        _convert_mha(src, f"{dp}.ca_text", out, (f"dec_{i}", "ca_text"))
        for n in ("norm1", "norm2", "norm3", "catext_norm"):
            _convert_ln(src, f"{dp}.{n}", out, (f"dec_{i}", n))
        for n in ("linear1", "linear2"):
            _convert_dense(src, f"{dp}.{n}", out, (f"dec_{i}", n))

    _convert_mlp(src, "bbox_embed.0", out, ("bbox_embed",))
    _convert_mlp(src, "pose_embed.0", out, ("pose_embed",))
    _convert_mlp(src, "pose_hw_embed.0", out, ("pose_hw_embed",))
    _convert_mlp(src, "projection", out, ("projection",))
    _convert_mlp(src, "projection_kpt", out, ("projection_kpt",))
    return out


def convert_clip_text(src: Mapping, num_layers: int = 12) -> Dict:
    """OpenAI CLIP (ViT-B/32) text tower -> toolbox.clip_text.CLIPTextEncoder.
    Keys as in the released CLIP state dict (`clip.load` model)."""
    out: Dict[str, Any] = {}
    _set(out, ("token_embedding",), _t(src["token_embedding.weight"]))
    _set(out, ("positional_embedding",), _t(src["positional_embedding"]))
    for i in range(num_layers):
        p = f"transformer.resblocks.{i}"
        d = f"layers_{i}"
        _convert_ln(src, f"{p}.ln_1", out, (f"{d}_ln_1",))
        _convert_ln(src, f"{p}.ln_2", out, (f"{d}_ln_2",))
        _set(out, (f"{d}_attn_in", "kernel"), dense_kernel(src[f"{p}.attn.in_proj_weight"]))
        _set(out, (f"{d}_attn_in", "bias"), _t(src[f"{p}.attn.in_proj_bias"]))
        _convert_dense(src, f"{p}.attn.out_proj", out, (f"{d}_attn_out",))
        _convert_dense(src, f"{p}.mlp.c_fc", out, (f"{d}_fc",))
        _convert_dense(src, f"{p}.mlp.c_proj", out, (f"{d}_proj",))
    _convert_ln(src, "ln_final", out, ("ln_final",))
    _set(out, ("text_projection",), _t(src["text_projection"]))
    return out


def convert_clip_text_hf(src: Mapping, num_layers: int = 12) -> Dict:
    """transformers-format CLIP text tower (openai/clip-vit-base-patch32
    pytorch_model.bin) -> CLIPTextEncoder. Same math as the openai-format
    converter above (quick_gelu, EOT pooling); only key names differ."""
    out: Dict[str, Any] = {}
    pre = "text_model."
    _set(out, ("token_embedding",), _t(src[f"{pre}embeddings.token_embedding.weight"]))
    _set(out, ("positional_embedding",),
         _t(src[f"{pre}embeddings.position_embedding.weight"]))
    for i in range(num_layers):
        p = f"{pre}encoder.layers.{i}"
        d = f"layers_{i}"
        _convert_ln(src, f"{p}.layer_norm1", out, (f"{d}_ln_1",))
        _convert_ln(src, f"{p}.layer_norm2", out, (f"{d}_ln_2",))
        # pack hf q/k/v into the fused attn_in Dense (q;k;v column order)
        qw = _t(src[f"{p}.self_attn.q_proj.weight"])
        kw = _t(src[f"{p}.self_attn.k_proj.weight"])
        vw = _t(src[f"{p}.self_attn.v_proj.weight"])
        qb = _t(src[f"{p}.self_attn.q_proj.bias"])
        kb = _t(src[f"{p}.self_attn.k_proj.bias"])
        vb = _t(src[f"{p}.self_attn.v_proj.bias"])
        _set(out, (f"{d}_attn_in", "kernel"), np.concatenate([qw, kw, vw], 0).T)
        _set(out, (f"{d}_attn_in", "bias"), np.concatenate([qb, kb, vb], 0))
        _convert_dense(src, f"{p}.self_attn.out_proj", out, (f"{d}_attn_out",))
        _convert_dense(src, f"{p}.mlp.fc1", out, (f"{d}_fc",))
        _convert_dense(src, f"{p}.mlp.fc2", out, (f"{d}_proj",))
    _convert_ln(src, f"{pre}final_layer_norm", out, ("ln_final",))
    _set(out, ("text_projection",), dense_kernel(src["text_projection.weight"]))
    return out


def _convert_conv(src: Mapping, prefix: str, out: Dict, dst: Tuple[str, ...]):
    _set(out, dst + ("kernel",), conv_kernel(src[f"{prefix}.weight"]))
    if f"{prefix}.bias" in src:
        _set(out, dst + ("bias",), _t(src[f"{prefix}.bias"]))


def convert_dpt(src: Mapping, depths: Tuple[int, ...] = (3, 4, 9),
                num_layers: int = 12) -> Dict:
    """transformers DPTForDepthEstimation(is_hybrid=True) state dict
    (Intel/dpt-hybrid-midas) -> toolbox.dpt.DPTHybridDepth param tree.

    Layout notes: BiT weight-standardized convs keep raw kernels (the
    standardization is applied at forward time on both sides); the ViT patch
    projection and fusion projections stay 1x1 convs; the reassemble
    projections become Dense. `dpt.layernorm` is skipped — the depth neck
    consumes raw (pre-final-layernorm) encoder states, so those weights are
    dead for depth estimation (modeling_dpt.DPTForDepthEstimation.forward).
    """
    out: Dict[str, Any] = {}
    bit = "dpt.embeddings.backbone.bit"
    _set(out, ("bit", "stem_conv", "kernel"),
         conv_kernel(src[f"{bit}.embedder.convolution.weight"]))
    _convert_ln(src, f"{bit}.embedder.norm", out, ("bit", "stem_norm"))
    for s, depth in enumerate(depths):
        for l in range(depth):
            p = f"{bit}.encoder.stages.{s}.layers.{l}"
            d = ("bit", f"stage{s}_layer{l}")
            if f"{p}.downsample.conv.weight" in src:
                _set(out, d + ("down_conv", "kernel"),
                     conv_kernel(src[f"{p}.downsample.conv.weight"]))
                _convert_ln(src, f"{p}.downsample.norm", out, d + ("down_norm",))
            for n in (1, 2, 3):
                _set(out, d + (f"conv{n}", "kernel"),
                     conv_kernel(src[f"{p}.conv{n}.weight"]))
                _convert_ln(src, f"{p}.norm{n}", out, d + (f"norm{n}",))

    _convert_conv(src, "dpt.embeddings.projection", out, ("projection",))
    _set(out, ("cls_token",), _t(src["dpt.embeddings.cls_token"]))
    _set(out, ("pos_embed",), _t(src["dpt.embeddings.position_embeddings"]))
    for i in range(num_layers):
        p = f"dpt.encoder.layer.{i}"
        d = (f"layer{i}",)
        _convert_ln(src, f"{p}.layernorm_before", out, d + ("ln1",))
        _convert_ln(src, f"{p}.layernorm_after", out, d + ("ln2",))
        _convert_dense(src, f"{p}.attention.attention.query", out, d + ("q",))
        _convert_dense(src, f"{p}.attention.attention.key", out, d + ("k",))
        _convert_dense(src, f"{p}.attention.attention.value", out, d + ("v",))
        _convert_dense(src, f"{p}.attention.output.dense", out, d + ("out",))
        _convert_dense(src, f"{p}.intermediate.dense", out, d + ("fc1",))
        _convert_dense(src, f"{p}.output.dense", out, d + ("fc2",))

    for i in (2, 3):
        _convert_dense(src, f"neck.reassemble_stage.readout_projects.{i}.0",
                       out, (f"readout{i}",))
        rp = f"neck.reassemble_stage.layers.{i}.projection"
        _set(out, (f"reassemble{i}_proj", "kernel"), conv1x1_as_dense(src[f"{rp}.weight"]))
        _set(out, (f"reassemble{i}_proj", "bias"), _t(src[f"{rp}.bias"]))
    _convert_conv(src, "neck.reassemble_stage.layers.3.resize", out,
                  ("reassemble3_resize",))
    for i in range(4):
        _set(out, (f"neck_conv{i}", "kernel"),
             conv_kernel(src[f"neck.convs.{i}.weight"]))
        p = f"neck.fusion_stage.layers.{i}"
        _convert_conv(src, f"{p}.projection", out, (f"fusion{i}_proj",))
        # fusion layer 0 (deepest) has no residual input; its residual_layer1
        # exists in the torch checkpoint but is never called — skip it.
        for r in ((2,) if i == 0 else (1, 2)):
            for c in (1, 2):
                _convert_conv(src, f"{p}.residual_layer{r}.convolution{c}", out,
                              (f"fusion{i}_res{r}", f"conv{c}"))
    _convert_conv(src, "head.head.0", out, ("head0",))
    _convert_conv(src, "head.head.2", out, ("head2",))
    _convert_conv(src, "head.head.4", out, ("head4",))
    return out
