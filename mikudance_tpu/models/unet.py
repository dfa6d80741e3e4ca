"""The two MikuDance UNets, TPU-native.

- ``GuidanceUNet``: the reference/guidance encoder ("MIX" / "MIX_CHAR",
  `/root/reference/src/models/unet_2d_mix.py`, `unet_2d_mix_char.py`): a 2D
  SD1.5-geometry UNet whose conv_in takes the 20-channel condition stack, with
  a MAN block after every down block (MIX only, `unet_2d_mix.py:556-557,1288`)
  and whose only *output* is the per-transformer-block attention banks
  (`conv_out` is disabled in the reference, `unet_2d_mix.py:1371-1375`).
- ``DenoisingUNet``: the 3D denoising UNet (`unet_3d_mix.py:34`): SD1.5
  inflated over frames (2D convs on a folded (B*T) batch — the literal meaning
  of ``InflatedConv3d``, `resnet.py:9-17`) with an AnimateDiff motion module
  after every attention/resnet layer, consuming the banks in its spatial
  self-attentions.

Bank pairing: the reference pairs writer/reader blocks by sorting all
transformer blocks by norm width descending with a stable DFS tiebreak
(`mutual_mix_attention.py:299-301`); because both UNets share the SD1.5
topology this reduces to *same structural position*, so banks are keyed by
position (``down_i_j`` / ``mid`` / ``up_i_j``) here.

Layout: NHWC; video tensors (B, T, H, W, C).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..core.configs import DenoisingUNetConfig, GuidanceUNetConfig, UNetConfig
from .layers import (FusedGroupNorm, SpatialTransformer, TimestepEmbed,
                     get_timestep_embedding)
from .man import MANBlock
from .motion_module import MotionModule
from .resnet import Downsample, ResnetBlock, Upsample, conv3x3


def bank_keys(cfg: UNetConfig) -> list:
    """Structural keys of all 16 spatial transformer blocks, in network order."""
    keys = []
    n = cfg.num_blocks
    for i in range(n - 1):  # cross-attn down blocks (last down block is plain)
        for j in range(cfg.layers_per_block):
            keys.append(f"down_{i}_{j}")
    keys.append("mid")
    for i in range(1, n):  # up block 0 is plain
        for j in range(cfg.layers_per_block + 1):
            keys.append(f"up_{i}_{j}")
    return keys


def _attn_module_name(key: str) -> str:
    """Structural bank key -> the spatial-transformer submodule holding it."""
    if key == "mid":
        return "mid_attn"
    kind, i, j = key.split("_")
    return f"{kind}_{i}_attn_{j}"


def _attn_kernels(den_params, key: str, which: str):
    p = den_params.get("params", den_params)
    attn = p[_attn_module_name(key)]["block"][which]
    return attn["to_k"]["kernel"], attn["to_v"]["kernel"]


def precompute_reference_kv(den_params, banks: Dict[str, jnp.ndarray],
                            dtype=jnp.bfloat16) -> Dict[str, tuple]:
    """Banks projected through each reader block's OWN attn1 K/V kernels.

    The reference injection is additive on the K/V *input* — ``kv = norm_h +
    ref`` (`mutual_mix_attention.py:169-180`); by linearity ``W(norm_h + ref)
    = W(norm_h) + W(ref)``, and ``W(ref)`` depends only on the t=0 condition
    stack, so it is computed ONCE per clip here instead of once per denoise
    step (the raw banks are then not needed by the scan at all). The same
    per-kernel matmul form as ``Attention.project_kv`` keeps numerics aligned.
    """
    out = {}
    for key, bank in banks.items():
        wk, wv = _attn_kernels(den_params, key, "attn1")
        b = bank.astype(dtype)
        out[key] = (b @ wk.astype(dtype), b @ wv.astype(dtype))
    return out


def precompute_context_kv(den_params, context: jnp.ndarray, keys,
                          dtype=jnp.bfloat16) -> Dict[str, tuple]:
    """Cross-attention K/V of the CLIP context, per reader block.

    The CLIP context never changes across denoise steps
    (`pipeline_mikudance.py:592-667`), so each attn2's K/V projections are
    step-invariant; hoisting them out of the scan saves 16 (tiny) matmul
    pairs per step. ``context``: (B, S, 768) — the per-frame repeat happens
    inside the UNet next to its ``ctx_f`` repeat."""
    out = {}
    c = context.astype(dtype)
    for key in keys:
        wk, wv = _attn_kernels(den_params, key, "attn2")
        out[key] = (c @ wk.astype(dtype), c @ wv.astype(dtype))
    return out


def _up_block_channels(cfg: UNetConfig, i: int):
    """(prev_output, output, skip_input) channels of up block i (diffusers logic)."""
    rev = list(reversed(cfg.block_out_channels))
    out_ch = rev[i]
    prev_ch = rev[max(i - 1, 0)]
    in_ch = rev[min(i + 1, len(rev) - 1)]
    return prev_ch, out_ch, in_ch


class GuidanceUNet(nn.Module):
    cfg: GuidanceUNetConfig = GuidanceUNetConfig()
    dtype: jnp.dtype = jnp.float32
    # Rematerialize per-block activations in the backward pass (stage-2
    # training at 576^2/20 frames overflows the 16 GB HBM without it;
    # inference keeps False). Param tree is unaffected.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        cond: jnp.ndarray,  # (B, H, W, 20) condition latent stack
        motion_map: Optional[jnp.ndarray],  # (B, H, W, 2) scene motion (MIX only)
        timesteps: jnp.ndarray,  # (B,) — the reference always passes 0
        context: jnp.ndarray,  # (B, S, 768) CLIP image tokens
    ) -> Dict[str, jnp.ndarray]:
        u = self.cfg.unet
        ch = u.block_out_channels
        heads = u.attention_heads
        banks: Dict[str, jnp.ndarray] = {}
        RB, ST = ResnetBlock, SpatialTransformer
        if self.remat:
            RB = nn.remat(ResnetBlock)
            ST = nn.remat(SpatialTransformer, static_argnums=(4,))  # 0 is self

        t_emb = get_timestep_embedding(
            timesteps, ch[0], u.flip_sin_to_cos, u.freq_shift
        ).astype(self.dtype)
        temb = TimestepEmbed(u.time_embed_dim, self.dtype, name="time_embedding")(t_emb)

        h = conv3x3(ch[0], self.dtype, "conv_in")(cond.astype(self.dtype))

        skips = [h]
        for i in range(u.num_blocks):
            is_final = i == u.num_blocks - 1
            has_attn = not is_final
            for j in range(u.layers_per_block):
                h = RB(ch[i], u.norm_num_groups, u.norm_eps, dtype=self.dtype,
                       name=f"down_{i}_res_{j}")(h, temb)
                if has_attn:
                    h, bank = ST(
                        ch[i], heads, u.cross_attention_dim, u.norm_num_groups,
                        dtype=self.dtype, remat=self.remat,
                        name=f"down_{i}_attn_{j}",
                    )(h, context, None, True)
                    banks[f"down_{i}_{j}"] = bank
                skips.append(h)
            if not is_final:
                h = Downsample(ch[i], self.dtype, name=f"down_{i}_down")(h)
                skips.append(h)
            if self.cfg.use_man and motion_map is not None:
                # MAN modulates only the main path, after the whole down block
                # (unet_2d_mix.py:1288); skip tensors are untouched.
                h = MANBlock(self.cfg.man_hidden, dtype=self.dtype, name=f"man_{i}")(
                    h, motion_map
                )

        h = RB(ch[-1], u.norm_num_groups, u.norm_eps, dtype=self.dtype,
               name="mid_res_0")(h, temb)
        h, bank = ST(
            ch[-1], heads, u.cross_attention_dim, u.norm_num_groups,
            dtype=self.dtype, remat=self.remat, name="mid_attn",
        )(h, context, None, True)
        banks["mid"] = bank
        h = RB(ch[-1], u.norm_num_groups, u.norm_eps, dtype=self.dtype,
               name="mid_res_1")(h, temb)

        for i in range(u.num_blocks):
            _, out_ch, _ = _up_block_channels(u, i)
            has_attn = i > 0  # up block 0 is the plain UpBlock
            for j in range(u.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = RB(out_ch, u.norm_num_groups, u.norm_eps, dtype=self.dtype,
                       name=f"up_{i}_res_{j}")(h, temb)
                if has_attn:
                    h, bank = ST(
                        out_ch, heads, u.cross_attention_dim, u.norm_num_groups,
                        dtype=self.dtype, remat=self.remat,
                        name=f"up_{i}_attn_{j}",
                    )(h, context, None, True)
                    banks[f"up_{i}_{j}"] = bank
            if i < u.num_blocks - 1:
                h = Upsample(out_ch, self.dtype, name=f"up_{i}_up")(h)

        # conv_norm_out / conv_out are disabled in the reference guidance UNet
        # (unet_2d_mix.py:1371-1375) — banks are the only output.
        return banks


class DenoisingUNet(nn.Module):
    cfg: DenoisingUNetConfig = DenoisingUNetConfig()
    dtype: jnp.dtype = jnp.float32
    # Inference SPMD: when applied inside a shard_map whose mesh shards the
    # frame axis, set these (e.g. den.clone(frame_axis="frame", frame_shards=4))
    # so the motion modules reshard for their cross-frame attention. Everything
    # else in this UNet is frame-local. Param tree is unaffected.
    frame_axis: Optional[str] = None
    frame_shards: int = 1
    # Rematerialize per-block activations in the backward pass (stage-2
    # training at 576^2/20 frames overflows the 16 GB HBM without it).
    remat: bool = False

    def _motion(self, name: str, dim: int):
        m = self.cfg.motion
        cls = nn.remat(MotionModule) if self.remat else MotionModule
        return cls(
            dim,
            remat=self.remat,
            heads=m.num_attention_heads,
            num_transformer_blocks=m.num_transformer_blocks,
            attention_layers=m.attention_layers_per_block,
            max_len=m.temporal_position_encoding_max_len,
            use_pe=m.temporal_position_encoding,
            dtype=self.dtype,
            frame_axis=self.frame_axis,
            frame_shards=self.frame_shards,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, T, H, W, 4) noisy latents
        timesteps: jnp.ndarray,  # (B,)
        context: jnp.ndarray,  # (B, S, 768) CLIP image tokens
        banks: Optional[Dict[str, jnp.ndarray]] = None,  # each (B*T, S_l, C_l)
        banks_kv: Optional[Dict[str, tuple]] = None,  # precomputed bank K/V
        ctx_kv: Optional[Dict[str, tuple]] = None,  # precomputed cross K/V (B, 257, C_l)
    ) -> jnp.ndarray:
        u = self.cfg.unet
        ch = u.block_out_channels
        heads = u.attention_heads
        use_motion = self.cfg.motion.enabled
        B, T, H, W, C = sample.shape
        RB, ST = ResnetBlock, SpatialTransformer
        if self.remat:
            RB = nn.remat(ResnetBlock)
            ST = nn.remat(SpatialTransformer, static_argnums=(4,))  # 0 is self

        def fold(x):  # (B, T, h, w, c) -> (B*T, h, w, c)
            return x.reshape((B * T,) + x.shape[2:])

        def unfold(x):  # (B*T, h, w, c) -> (B, T, h, w, c)
            return x.reshape((B, T) + x.shape[1:])

        t_emb = get_timestep_embedding(
            timesteps, ch[0], u.flip_sin_to_cos, u.freq_shift
        ).astype(self.dtype)
        temb = TimestepEmbed(u.time_embed_dim, self.dtype, name="time_embedding")(t_emb)
        temb_f = jnp.repeat(temb, T, axis=0)  # per-frame
        ctx_f = jnp.repeat(context.astype(self.dtype), T, axis=0)

        def ref(key):
            return None if banks is None else banks.get(key)

        def ref_kv(key):
            return None if banks_kv is None else banks_kv.get(key)

        def ckv(key):
            if ctx_kv is None:
                return None
            k, v = ctx_kv[key]
            return jnp.repeat(k, T, axis=0), jnp.repeat(v, T, axis=0)

        h = conv3x3(ch[0], self.dtype, "conv_in")(fold(sample.astype(self.dtype)))

        skips = [h]
        for i in range(u.num_blocks):
            is_final = i == u.num_blocks - 1
            has_attn = not is_final
            for j in range(u.layers_per_block):
                h = RB(ch[i], u.norm_num_groups, u.norm_eps, dtype=self.dtype,
                       name=f"down_{i}_res_{j}")(h, temb_f)
                if has_attn:
                    h, _ = ST(
                        ch[i], heads, u.cross_attention_dim, u.norm_num_groups,
                        dtype=self.dtype, remat=self.remat,
                        name=f"down_{i}_attn_{j}",
                    )(h, ctx_f, ref(f"down_{i}_{j}"), False,
                      ref_kv(f"down_{i}_{j}"), ckv(f"down_{i}_{j}"))
                if use_motion:
                    h = fold(self._motion(f"down_{i}_motion_{j}", ch[i])(unfold(h)))
                skips.append(h)
            if not is_final:
                h = Downsample(ch[i], self.dtype, name=f"down_{i}_down")(h)
                skips.append(h)

        h = RB(ch[-1], u.norm_num_groups, u.norm_eps, dtype=self.dtype,
               name="mid_res_0")(h, temb_f)
        h, _ = ST(
            ch[-1], heads, u.cross_attention_dim, u.norm_num_groups,
            dtype=self.dtype, remat=self.remat, name="mid_attn",
        )(h, ctx_f, ref("mid"), False, ref_kv("mid"), ckv("mid"))
        if use_motion and self.cfg.motion.mid_block:
            h = fold(self._motion("mid_motion", ch[-1])(unfold(h)))
        h = RB(ch[-1], u.norm_num_groups, u.norm_eps, dtype=self.dtype,
               name="mid_res_1")(h, temb_f)

        for i in range(u.num_blocks):
            _, out_ch, _ = _up_block_channels(u, i)
            has_attn = i > 0
            for j in range(u.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = RB(out_ch, u.norm_num_groups, u.norm_eps, dtype=self.dtype,
                       name=f"up_{i}_res_{j}")(h, temb_f)
                if has_attn:
                    h, _ = ST(
                        out_ch, heads, u.cross_attention_dim, u.norm_num_groups,
                        dtype=self.dtype, remat=self.remat,
                        name=f"up_{i}_attn_{j}",
                    )(h, ctx_f, ref(f"up_{i}_{j}"), False,
                      ref_kv(f"up_{i}_{j}"), ckv(f"up_{i}_{j}"))
                if use_motion:
                    h = fold(self._motion(f"up_{i}_motion_{j}", out_ch)(unfold(h)))
            if i < u.num_blocks - 1:
                h = Upsample(out_ch, self.dtype, name=f"up_{i}_up")(h)

        h = FusedGroupNorm(u.norm_num_groups, u.norm_eps, act="silu",
                           dtype=self.dtype, name="conv_norm_out")(h)
        h = conv3x3(u.out_channels, self.dtype, "conv_out")(h)
        return unfold(h)
