"""DPT-hybrid-MiDaS monocular depth estimation in Flax (NHWC, TPU-native).

Rebuilds the depth model behind the reference's depth tool
(`/root/reference/tools/depth_from_image.py:16-50`, which runs HF
``Intel/dpt-hybrid-midas`` on CUDA): a BiT (ResNetv2, weight-standardized
convs) stem+3 stages, a ViT-B/16 encoder over the /16 feature map, the DPT
reassemble+fusion neck, and the depth head. Checkpoint-exact vs
``transformers.DPTForDepthEstimation(is_hybrid=True)`` through
``core.convert.convert_dpt`` (parity-tested in tests/test_dpt_parity.py).

Architecture facts replicated from transformers' modeling_dpt/modeling_bit:
- weight-standardized convs (per-out-channel, biased var, eps 1e-8) with
  TF-SAME dynamic padding; GroupNorm(32, eps 1e-5) + ReLU after each conv;
  non-preactivation bottleneck (shortcut downsample conv+GN, final ReLU).
- hybrid features = [BiT stage1 (/4), BiT stage2 (/8), ViT layer-9 tokens,
  ViT layer-12 tokens] (``backbone_out_indices[2:] = [8, 11]``, and the
  final ``dpt.layernorm`` is NOT applied to neck features).
- readout_type "project": tokens concat broadcast-cls -> Linear + GELU.
- reassemble factors (1, 1, 1, 0.5): identity / stride-2 3x3 conv resize.
- fusion: pre-activation residual units, x2 bilinear upsample with
  align_corners=True, then 1x1 projection.
- head: 3x3 conv -> x2 bilinear (align_corners=True) -> 3x3 conv -> ReLU ->
  1x1 conv -> ReLU.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Intel/dpt-hybrid-midas normalization (DPTImageProcessor: rescale 1/255,
# mean 0.5, std 0.5, resize 384x384).
IMAGE_SIZE = 384
IMAGE_MEAN = 0.5
IMAGE_STD = 0.5


@dataclasses.dataclass(frozen=True)
class DPTHybridConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_grid: int = 24  # 384 / 16
    bit_embed: int = 64
    bit_depths: Tuple[int, ...] = (3, 4, 9)
    bit_hidden: Tuple[int, ...] = (256, 512, 1024)
    neck_hidden: Tuple[int, ...] = (256, 512, 768, 768)
    fusion_hidden: int = 256
    vit_out_layers: Tuple[int, ...] = (8, 11)  # 0-based encoder layer outputs
    gn_groups: int = 32
    gn_eps: float = 1e-5
    ln_eps: float = 1e-12  # transformers DPTConfig.layer_norm_eps
    ws_eps: float = 1e-8


class WSConv(nn.Module):
    """Weight-standardized conv (BiT): kernel normalized per out channel over
    (kh, kw, in) with biased variance, matching HF's batch_norm trick."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        mu = w.mean(axis=(0, 1, 2), keepdims=True)
        var = w.var(axis=(0, 1, 2), keepdims=True)  # biased, as torch batch_norm
        w = (w - mu) * jax.lax.rsqrt(var + self.eps)
        return jax.lax.conv_general_dilated(
            x, w, window_strides=self.strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BitBottleneck(nn.Module):
    """Non-preactivation ResNetv2 bottleneck (HF BitBottleneckLayer)."""

    out_ch: int
    stride: int = 1
    downsample: bool = False
    gn_groups: int = 32
    gn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mid = self.out_ch // 4
        gn = lambda name, c: nn.GroupNorm(  # noqa: E731
            num_groups=self.gn_groups, epsilon=self.gn_eps, name=name)

        shortcut = x
        if self.downsample:
            shortcut = WSConv(self.out_ch, (1, 1), (self.stride, self.stride),
                              name="down_conv")(x)
            shortcut = gn("down_norm", self.out_ch)(shortcut)

        h = WSConv(mid, (1, 1), name="conv1")(x)
        h = nn.relu(gn("norm1", mid)(h))
        h = WSConv(mid, (3, 3), (self.stride, self.stride), name="conv2")(h)
        h = nn.relu(gn("norm2", mid)(h))
        h = WSConv(self.out_ch, (1, 1), name="conv3")(h)
        h = gn("norm3", self.out_ch)(h)
        return nn.relu(h + shortcut)


class BitBackbone(nn.Module):
    """BiT stem + 3 stages; returns (/4 stage1, /8 stage2, /16 stage3)."""

    cfg: DPTHybridConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = WSConv(cfg.bit_embed, (7, 7), (2, 2), name="stem_conv")(x)
        h = nn.relu(nn.GroupNorm(num_groups=cfg.gn_groups, epsilon=cfg.gn_eps,
                                 name="stem_norm")(h))
        # TF-SAME 3x3 stride-2 max pool (torch pads with 0; inputs are
        # post-ReLU >= 0, so -inf vs 0 padding is equivalent here)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")

        feats = []
        for si, (depth, ch) in enumerate(zip(cfg.bit_depths, cfg.bit_hidden)):
            stride = 1 if si == 0 else 2
            for li in range(depth):
                h = BitBottleneck(
                    out_ch=ch, stride=stride if li == 0 else 1,
                    downsample=(li == 0), gn_groups=cfg.gn_groups,
                    gn_eps=cfg.gn_eps, name=f"stage{si}_layer{li}",
                )(h)
            feats.append(h)
        return feats  # [(B,96,96,256), (B,48,48,512), (B,24,24,1024)] @384


class ViTLayer(nn.Module):
    cfg: DPTHybridConfig

    @nn.compact
    def __call__(self, t):
        cfg = self.cfg
        hd = cfg.hidden_size // cfg.num_heads
        h = nn.LayerNorm(epsilon=cfg.ln_eps, name="ln1")(t)
        q = nn.Dense(cfg.hidden_size, name="q")(h)
        k = nn.Dense(cfg.hidden_size, name="k")(h)
        v = nn.Dense(cfg.hidden_size, name="v")(h)
        B, N, C = q.shape
        split = lambda a: a.reshape(B, N, cfg.num_heads, hd).transpose(0, 2, 1, 3)  # noqa: E731
        s = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) / jnp.sqrt(hd)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, split(v))
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        t = t + nn.Dense(cfg.hidden_size, name="out")(o)
        h = nn.LayerNorm(epsilon=cfg.ln_eps, name="ln2")(t)
        h = nn.gelu(nn.Dense(cfg.mlp_dim, name="fc1")(h), approximate=False)
        return t + nn.Dense(cfg.hidden_size, name="fc2")(h)


def _upsample2x_ac(x: jnp.ndarray) -> jnp.ndarray:
    """x2 bilinear upsample with align_corners=True (torch semantics; jax's
    resize has no align_corners mode). src coords: i * (H-1) / (2H-1)."""
    B, H, W, C = x.shape

    def axis_weights(n):
        out = 2 * n
        pos = jnp.arange(out) * (n - 1) / (out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        w = (pos - lo).astype(x.dtype)
        return lo, hi, w

    lo, hi, w = axis_weights(H)
    x = x[:, lo] * (1 - w)[None, :, None, None] + x[:, hi] * w[None, :, None, None]
    lo, hi, w = axis_weights(W)
    x = x[:, :, lo] * (1 - w)[None, None, :, None] + x[:, :, hi] * w[None, None, :, None]
    return x


class ResidualConvUnit(nn.Module):
    """Pre-activation residual unit (DPTPreActResidualLayer)."""

    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(nn.relu(x))
        h = nn.Conv(self.ch, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(nn.relu(h))
        return x + h


class DPTHybridDepth(nn.Module):
    """Full DPT-hybrid depth model: (B, 384, 384, 3) normalized pixels ->
    (B, 384, 384) predicted (relative, un-normalized) depth."""

    cfg: DPTHybridConfig = DPTHybridConfig()

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        s1, s2, s3 = BitBackbone(cfg, name="bit")(pixels)

        # ViT over the /16 feature map
        t = nn.Conv(cfg.hidden_size, (1, 1), name="projection")(s3)
        B, gh, gw, C = t.shape
        t = t.reshape(B, gh * gw, C)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, C), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, cfg.patch_grid * cfg.patch_grid + 1, C), jnp.float32)
        if gh != cfg.patch_grid or gw != cfg.patch_grid:
            raise ValueError("DPTHybridDepth is fixed to 384x384 inputs")
        t = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, C)), t], axis=1) + pos

        taps = {}
        for i in range(cfg.num_layers):
            t = ViTLayer(cfg, name=f"layer{i}")(t)
            if i in cfg.vit_out_layers:
                taps[i] = t

        # reassemble the two ViT taps (readout_type="project")
        def reassemble(tokens, idx):
            cls_tok, tok = tokens[:, :1], tokens[:, 1:]
            cat = jnp.concatenate(
                [tok, jnp.broadcast_to(cls_tok, tok.shape)], axis=-1)
            tok = nn.gelu(
                nn.Dense(cfg.hidden_size, name=f"readout{idx}")(cat),
                approximate=False)
            fmap = tok.reshape(B, gh, gw, cfg.hidden_size)
            fmap = nn.Dense(cfg.neck_hidden[idx], name=f"reassemble{idx}_proj")(fmap)
            if idx == 3:  # factor 0.5: stride-2 3x3 conv (torch padding=1)
                fmap = nn.Conv(cfg.neck_hidden[idx], (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)),
                               name=f"reassemble{idx}_resize")(fmap)
            return fmap

        feats = [s1, s2,
                 reassemble(taps[cfg.vit_out_layers[0]], 2),
                 reassemble(taps[cfg.vit_out_layers[1]], 3)]
        feats = [
            nn.Conv(cfg.fusion_hidden, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name=f"neck_conv{i}")(f)
            for i, f in enumerate(feats)
        ]

        # fusion: deepest first; each merges, refines, upsamples x2, projects
        fused = None
        for li, f in enumerate(reversed(feats)):
            if fused is None:
                fused = f
            else:
                fused = fused + ResidualConvUnit(
                    cfg.fusion_hidden, name=f"fusion{li}_res1")(f)
            fused = ResidualConvUnit(cfg.fusion_hidden, name=f"fusion{li}_res2")(fused)
            fused = _upsample2x_ac(fused)
            fused = nn.Conv(cfg.fusion_hidden, (1, 1), name=f"fusion{li}_proj")(fused)

        h = nn.Conv(cfg.fusion_hidden // 2, (3, 3), padding=((1, 1), (1, 1)),
                    name="head0")(fused)
        h = _upsample2x_ac(h)
        h = nn.relu(nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="head2")(h))
        h = nn.relu(nn.Conv(1, (1, 1), name="head4")(h))
        return h[..., 0]


def preprocess(image_rgb_uint8) -> jnp.ndarray:
    """(H, W, 3) uint8 -> (1, 384, 384, 3) normalized fp32 (bicubic resize,
    rescale 1/255, mean/std 0.5 — DPTImageProcessor for dpt-hybrid-midas)."""
    import numpy as np
    from PIL import Image

    img = Image.fromarray(np.asarray(image_rgb_uint8)).resize(
        (IMAGE_SIZE, IMAGE_SIZE), Image.BICUBIC)
    x = np.asarray(img, dtype=np.float32) / 255.0
    x = (x - IMAGE_MEAN) / IMAGE_STD
    return jnp.asarray(x)[None]
