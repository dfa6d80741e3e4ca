"""UniPose: open-vocabulary keypoint detector, Flax — checkpoint-exact rebuild.

Rebuilds the *live inference path* of `/root/reference/src/XPose/models/
UniPose/unipose.py:35,316` + `deformable_transformer.py:38` +
`fuse_modules.py:100,243` + `transformer_vanilla.py:62` with the exact
computation graph of the UniPose_SwinT build (`config_model/UniPose_SwinT.py`:
hidden 256, 6 enc + 6 dec layers, 8 heads, 4 feature levels, 4 points,
900 queries, dim_feedforward 2048, two_stage 'standard', embed_init_tgt,
text enhancer + fusion + text cross-attention, num_body_points 68), so that
the released checkpoint converts weight-for-weight (`core/convert.py::
convert_unipose`) and reproduces the torch activations (tests/
test_unipose_parity.py builds the actual reference torch model as the oracle).

Flow:
  Swin-T -> 3 stage features + stride-2 extra level -> 1x1/3x3 proj + GN(32)
  -> flatten + SineHW position embeddings (+ level embed)
  -> 6x [BiAttention image<->text fusion; text self-enhance layer;
         deformable self-attention + FFN]
  -> two-stage proposal selection (gen_encoder_output_proposals -> enc_output
     -> contrastive class vs text -> top-900 -> box init)
  -> decoder: 2 box layers on 900 queries, then top-50 instances expand to
     50 x (1 box + 68 keypoint) queries (keypoint queries = projected CLIP
     keypoint-text embeddings), group-isolated self-attention
     (mask_generate.py:10-43), text cross-attention, deformable cross-
     attention, iterative box/pose refinement
  -> heads: contrastive logits, box, keypoint xy (+ constant-vis z slots,
     keypoint_xyzxyz_to_xyxyzz layout).

Inference-only simplifications (explicitly safe):
- no image padding masks: the drivers batch uniformly-sized frames, so every
  mask is all-valid and valid_ratios == 1 (`deformable_transformer.py:297`);
- the dead-at-inference DN branches and the `* 0.0` gradient hacks
  (`unipose.py:421-426`) are dropped; label_enc/pos_proj/padding/clip_model
  weights are never used in the eval forward.

TPU notes: everything is static-shaped; the deformable attention gathers run
through `toolbox.deformable.ms_deform_attn` (dense jnp, parity-tested against
the reference's grid_sample spec); level loops unroll at trace time.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .deformable import ms_deform_attn
from .swin import SwinTransformer

NEG_INF = float(np.finfo(np.float32).min)


# ---------------------------------------------------------------------------
# positional embeddings (all exact rebuilds)
# ---------------------------------------------------------------------------


def sine_pos_embed_hw(h: int, w: int, num_feats: int = 128,
                      temp_h: float = 20.0, temp_w: float = 20.0) -> np.ndarray:
    """PositionEmbeddingSineHW (`position_encoding.py:67-110`), normalized,
    no padding: cumsum of an all-valid mask. Returns (h*w, 2*num_feats)."""
    eps, scale = 1e-6, 2 * math.pi
    y = (np.arange(h, dtype=np.float64) + 1.0)
    x = (np.arange(w, dtype=np.float64) + 1.0)
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_tx = temp_w ** (2 * (np.arange(num_feats) // 2) / num_feats)
    dim_ty = temp_h ** (2 * (np.arange(num_feats) // 2) / num_feats)
    pos_x = x[:, None] / dim_tx  # (w, F)
    pos_y = y[:, None] / dim_ty  # (h, F)

    def interleave(p):
        return np.stack([np.sin(p[:, 0::2]), np.cos(p[:, 1::2])], axis=2).reshape(
            p.shape[0], -1)

    pos_x = interleave(pos_x)  # (w, F)
    pos_y = interleave(pos_y)  # (h, F)
    grid = np.concatenate(
        [np.broadcast_to(pos_y[:, None], (h, w, num_feats)),
         np.broadcast_to(pos_x[None, :], (h, w, num_feats))], axis=-1)
    return grid.reshape(h * w, 2 * num_feats).astype(np.float32)


def gen_sineembed_for_position(pos: jnp.ndarray) -> jnp.ndarray:
    """(B, Q, 4) sigmoid-space boxes -> (B, Q, 512) (`utils.py:193-219`)."""
    scale = 2 * math.pi
    dim_t = 10000.0 ** (2 * (jnp.arange(128) // 2) / 128.0)

    def embed(v):  # (B, Q) -> (B, Q, 128)
        p = (v * scale)[..., None] / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
                         ).reshape(p.shape[:-1] + (128,))

    return jnp.concatenate(
        [embed(pos[..., 1]), embed(pos[..., 0]),
         embed(pos[..., 2]), embed(pos[..., 3])], axis=-1)


def get_sine_pos_embed(pos: jnp.ndarray, num_feats: int = 256) -> jnp.ndarray:
    """`utils.py:26-55` with exchange_xy=False on a (..., 1) tensor."""
    scale = 2 * math.pi
    dim_t = 10000.0 ** (2 * (jnp.arange(num_feats) // 2) / num_feats)
    p = pos[..., 0:1] * scale / dim_t
    return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
                     ).reshape(pos.shape[:-1] + (num_feats,))


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """`util/misc.py:689-693` (note eps 1e-3)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


class MLP(nn.Module):
    """`utils.py:162-174`: Linear stack with ReLU between."""

    hidden: int
    out: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            width = self.out if i == self.num_layers - 1 else self.hidden
            x = nn.Dense(width, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention semantics (packed in_proj split to q/k/v
    by the converter). attn_mask True = blocked; key_padding True = pad."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None, key_padding_mask=None):
        B, Q, C = q.shape
        S = k.shape[1]
        hd = self.dim // self.heads
        qh = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(q)
        kh = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(k)
        vh = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(v)
        qh = qh.reshape(B, Q, self.heads, hd)
        kh = kh.reshape(B, S, self.heads, hd)
        vh = vh.reshape(B, S, self.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        if attn_mask is not None:
            # (Q, S) or (B, Q, S) or (B, heads, Q, S) boolean, True = blocked.
            # A 3-D mask is per-SAMPLE: its batch dim must land on logits'
            # batch axis, with the heads axis broadcast — not be promoted
            # into the heads slot.
            m = attn_mask
            if m.ndim == 2:
                m = m[None, None]  # (1, 1, Q, S)
            elif m.ndim == 3:
                m = m[:, None]  # (B, 1, Q, S)
            logits = jnp.where(m, NEG_INF, logits)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, logits)
        w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(B, Q, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class MSDeformAttnModule(nn.Module):
    """MSDeformAttn (`ops/modules/ms_deform_attn.py:33,83-143`): learned
    sampling offsets + softmax weights around 2D or 4D reference points."""

    dim: int = 256
    heads: int = 8
    levels: int = 4
    points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, ref_points, value, spatial_shapes):
        """query (B,Q,C); ref_points (B,Q,L,2|4); value (B,S,C)."""
        B, Q, C = query.shape
        Hh, L, P = self.heads, self.levels, self.points
        v = nn.Dense(C, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(B, -1, Hh, C // Hh)

        off = nn.Dense(Hh * L * P * 2, dtype=self.dtype, name="sampling_offsets")(query)
        off = off.reshape(B, Q, Hh, L, P, 2)
        attn = nn.Dense(Hh * L * P, dtype=self.dtype, name="attention_weights")(query)
        attn = jax.nn.softmax(attn.reshape(B, Q, Hh, L * P), axis=-1)
        attn = attn.reshape(B, Q, Hh, L, P)

        if ref_points.shape[-1] == 2:
            wh = jnp.asarray([[s[1], s[0]] for s in spatial_shapes], jnp.float32)
            loc = ref_points[:, :, None, :, None, :] + off / wh[None, None, None, :, None, :]
        else:  # 4D boxes: offsets scaled by box size (`ms_deform_attn.py:121-123`)
            loc = (ref_points[:, :, None, :, None, :2]
                   + off / P * ref_points[:, :, None, :, None, 2:] * 0.5)
        out = ms_deform_attn(v, spatial_shapes, loc, attn)
        return nn.Dense(C, dtype=self.dtype, name="output_proj")(out)


class DeformEncoderLayer(nn.Module):
    """DeformableTransformerEncoderLayer (`deformable_transformer.py:943-998`)."""

    dim: int = 256
    ffn: int = 2048
    levels: int = 4
    points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, ref_points, spatial_shapes):
        src2 = MSDeformAttnModule(
            self.dim, levels=self.levels, points=self.points, dtype=self.dtype,
            name="self_attn")(src + pos, ref_points, src, spatial_shapes)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + src2)
        h = nn.Dense(self.ffn, dtype=self.dtype, name="linear1")(src)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + h)


class TextEnhanceLayer(nn.Module):
    """transformer_vanilla.TransformerEncoderLayer with the eye self-attention
    mask (each text token attends only to itself) and sine position ids."""

    dim: int = 256
    heads: int = 4
    ffn: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, txt, pos, self_mask):
        """txt (B,N,C); pos (B,N,C); self_mask (B,N,N) True = blocked."""
        q = txt + pos
        t2 = MultiheadAttention(self.dim, self.heads, dtype=self.dtype,
                                name="self_attn")(q, q, txt, attn_mask=self_mask[:, None])
        txt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(txt + t2)
        h = nn.Dense(self.ffn, dtype=self.dtype, name="linear1")(txt)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(txt + h)


class BiAttentionBlock(nn.Module):
    """fuse_modules.BiAttentionBlock (`fuse_modules.py:100-277`): pre-LN
    bidirectional image<->text attention with layer-scale gammas, the global
    stable-softmax max subtraction, and +-50000 clamps."""

    v_dim: int = 256
    l_dim: int = 256
    embed_dim: int = 1024
    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v, l, text_pad_mask=None):
        """v (B,S,C) image tokens; l (B,N,C) text; text_pad_mask True = pad."""
        B, S, _ = v.shape
        N = l.shape[1]
        hd = self.embed_dim // self.heads
        vn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_v")(v)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_l")(l)

        scale = hd ** -0.5
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(vn) * scale
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="l_proj")(ln)
        val_v = nn.Dense(self.embed_dim, dtype=self.dtype, name="values_v_proj")(vn)
        val_l = nn.Dense(self.embed_dim, dtype=self.dtype, name="values_l_proj")(ln)

        q = q.reshape(B, S, self.heads, hd)
        k = k.reshape(B, N, self.heads, hd)
        val_v = val_v.reshape(B, S, self.heads, hd)
        val_l = val_l.reshape(B, N, self.heads, hd)

        aw = jnp.einsum("bshd,bnhd->bhsn", q, k,
                        preferred_element_type=jnp.float32)
        aw = aw - jnp.max(aw)  # stable_softmax_2d: global max
        aw = jnp.clip(aw, -50000, 50000)

        aw_t = jnp.swapaxes(aw, -1, -2)  # (B,h,N,S) text->image weights
        aw_l = aw_t - jnp.max(aw_t, axis=-1, keepdims=True)
        aw_l = jnp.clip(aw_l, -50000, 50000)
        # (no image padding at inference -> no mask on aw_l)
        p_l = jax.nn.softmax(aw_l, axis=-1).astype(val_v.dtype)

        if text_pad_mask is not None:
            aw = jnp.where(text_pad_mask[:, None, None, :], -jnp.inf, aw)
        p_v = jax.nn.softmax(aw, axis=-1).astype(val_l.dtype)

        out_v = jnp.einsum("bhsn,bnhd->bshd", p_v, val_l).reshape(B, S, self.embed_dim)
        out_l = jnp.einsum("bhns,bshd->bnhd", p_l, val_v).reshape(B, N, self.embed_dim)
        dv = nn.Dense(self.v_dim, dtype=self.dtype, name="out_v_proj")(out_v)
        dl = nn.Dense(self.l_dim, dtype=self.dtype, name="out_l_proj")(out_l)

        gamma_v = self.param("gamma_v", nn.initializers.constant(1e-4), (self.v_dim,))
        gamma_l = self.param("gamma_l", nn.initializers.constant(1e-4), (self.l_dim,))
        return vn + gamma_v * dv, ln + gamma_l * dl


class DeformDecoderLayer(nn.Module):
    """DeformableTransformerDecoderLayer (`deformable_transformer.py:1001-1137`):
    self-attn (group mask) -> text cross-attn -> deformable cross-attn -> FFN."""

    dim: int = 256
    heads: int = 8
    ffn: int = 2048
    levels: int = 4
    points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, ref_points, memory, spatial_shapes,
                 memory_text, text_pad_mask, self_attn_mask=None):
        q = tgt + query_pos
        t2 = MultiheadAttention(self.dim, self.heads, dtype=self.dtype,
                                name="self_attn")(q, q, tgt, attn_mask=self_attn_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt + t2)

        t2 = MultiheadAttention(self.dim, self.heads, dtype=self.dtype,
                                name="ca_text")(tgt + query_pos, memory_text,
                                                memory_text,
                                                key_padding_mask=text_pad_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="catext_norm")(tgt + t2)

        t2 = MSDeformAttnModule(
            self.dim, self.heads, self.levels, self.points, dtype=self.dtype,
            name="cross_attn")(tgt + query_pos, ref_points, memory, spatial_shapes)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt + t2)

        h = nn.Dense(self.ffn, dtype=self.dtype, name="linear1")(tgt)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt + h)


def contrastive_logits(x: jnp.ndarray, text: jnp.ndarray,
                       text_token_mask: jnp.ndarray) -> jnp.ndarray:
    """ContrastiveAssign (`unipose.py:587-635`): dot vs text embeddings,
    padded tokens -> -inf."""
    res = jnp.einsum("bqc,bnc->bqn", x, text)
    return jnp.where(text_token_mask[:, None, :], res, -jnp.inf)


def gen_encoder_output_proposals(
    memory: jnp.ndarray, spatial_shapes: Sequence[Tuple[int, int]]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`utils.py:58-113` with all-valid masks: per-token anchor boxes
    (cell center, wh = 0.05 * 2^level) in unsigmoid space; invalid (border)
    proposals -> +inf and their memory zeroed."""
    props = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        grid = np.stack([gx, gy], -1)  # (h, w, 2)
        grid = (grid + 0.5) / np.asarray([w, h], np.float32)
        wh = np.full_like(grid, 0.05 * (2.0 ** lvl))
        props.append(np.concatenate([grid, wh], -1).reshape(-1, 4))
    proposals = np.concatenate(props, 0)  # (S, 4)
    valid = ((proposals > 0.01) & (proposals < 0.99)).all(-1, keepdims=True)
    uns = np.log(proposals / (1 - proposals))
    uns = np.where(valid, uns, np.inf).astype(np.float32)
    out_prop = jnp.asarray(uns)[None]
    out_mem = jnp.where(jnp.asarray(valid[None]), memory, 0.0)
    return out_mem, out_prop


def keypoint_group_mask(kpt_mask: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """prepare_for_mask (`mask_generate.py:10-43`): (B, G*S, G*S) bool mask,
    True = blocked. Cross-group always blocked; within a group, tokens attend
    only to tokens with equal visibility flag. kpt_mask: (B, S) with S = 1 +
    num_body_points (leading 1 for the instance slot)."""
    B, S = kpt_mask.shape
    n = num_groups * S
    g = np.arange(n) // S
    cross = jnp.asarray(g[:, None] != g[None, :])  # (n, n)
    eq = kpt_mask[:, :, None] == kpt_mask[:, None, :]  # (B, S, S)
    within_block = jnp.tile(~eq, (1, num_groups, num_groups))  # (B, n, n)
    return jnp.where(cross[None], True, within_block)


def keypoint_xyzxyz_to_xyxyzz(x: jnp.ndarray) -> jnp.ndarray:
    """`util/keypoint_ops.py`: (..., 3K) interleaved xyz -> [all xy | all z]."""
    return jnp.concatenate(
        [x[..., 0::3][..., :, None], x[..., 1::3][..., :, None]], -1
    ).reshape(x.shape[:-1] + (-1,)), x[..., 2::3]


class UniPose(nn.Module):
    """Checkpoint-exact UniPose (inference forward). See module docstring."""

    hidden_dim: int = 256
    enc_layers: int = 6
    dec_layers: int = 6
    heads: int = 8
    levels: int = 4
    points: int = 4
    ffn_dim: int = 2048
    num_queries: int = 900
    num_groups: int = 50  # inter_select_number (`deformable_transformer.py:812`)
    num_body_points: int = 68
    num_box_decoder_layers: int = 2
    text_dim: int = 512  # CLIP ViT-B/32
    swin_embed_dim: int = 96
    swin_depths: Tuple[int, ...] = (2, 2, 6, 2)
    swin_heads: Tuple[int, ...] = (3, 6, 12, 24)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,  # (B, H, W, 3) normalized
        obj_text: jnp.ndarray,  # (B, N_txt, text_dim) CLIP instance embeddings
        text_token_mask: jnp.ndarray,  # (B, N_txt) bool, True = real token
        kpt_text: jnp.ndarray,  # (B, K, text_dim) CLIP keypoint embeddings
        kpt_vis: jnp.ndarray,  # (B, K) 1.0 = real keypoint slot
    ):
        B = image.shape[0]
        C = self.hidden_dim
        K = self.num_body_points
        G = self.num_groups
        slots = K + 1

        # ---- text projections (`unipose.py:115-117,340-342`)
        txt = MLP(C, C, 3, dtype=self.dtype, name="projection")(
            obj_text.astype(self.dtype))
        kpt_embed = MLP(C, C, 3, dtype=self.dtype, name="projection_kpt")(
            kpt_text.astype(self.dtype))

        # ---- backbone + input projections (`unipose.py:135-152,378-398`)
        feats = SwinTransformer(
            embed_dim=self.swin_embed_dim, depths=self.swin_depths,
            heads=self.swin_heads, dtype=self.dtype, name="backbone")(image)
        srcs = []
        for i, f in enumerate(feats):
            p = nn.Conv(C, (1, 1), dtype=self.dtype, name=f"input_proj_{i}")(f)
            p = nn.GroupNorm(32, dtype=self.dtype, name=f"input_proj_norm_{i}")(p)
            srcs.append(p)
        nb = len(feats)
        extra = nn.Conv(C, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"input_proj_{nb}")(feats[-1])
        extra = nn.GroupNorm(32, dtype=self.dtype, name=f"input_proj_norm_{nb}")(extra)
        srcs.append(extra)

        spatial_shapes = [(f.shape[1], f.shape[2]) for f in srcs]
        src = jnp.concatenate([f.reshape(B, -1, C) for f in srcs], axis=1)
        S = src.shape[1]

        pos = np.concatenate(
            [sine_pos_embed_hw(h, w, C // 2) for h, w in spatial_shapes], 0)
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.levels, C))
        lvl = jnp.concatenate(
            [jnp.broadcast_to(level_embed[i], (h * w, C))
             for i, (h, w) in enumerate(spatial_shapes)], axis=0)
        pos = (jnp.asarray(pos) + lvl)[None].astype(self.dtype)

        # encoder reference points: own cell center at every level
        # (`deformable_transformer.py:584-596`, valid_ratios = 1)
        centers = []
        for h, w in spatial_shapes:
            gy, gx = np.meshgrid(
                np.linspace(0.5, h - 0.5, h, dtype=np.float32) / h,
                np.linspace(0.5, w - 0.5, w, dtype=np.float32) / w, indexing="ij")
            centers.append(np.stack([gx.ravel(), gy.ravel()], -1))
        centers = np.concatenate(centers, 0)  # (S, 2)
        enc_ref = jnp.broadcast_to(
            jnp.asarray(centers)[None, :, None], (B, S, self.levels, 2))

        # text positions: sine embed of position_ids (1 real / 0 pad)
        pos_text = get_sine_pos_embed(
            text_token_mask.astype(jnp.float32)[..., None], C)
        text_self_mask = ~jnp.eye(txt.shape[1], dtype=bool)[None]  # eye allowed
        text_pad = ~text_token_mask

        # ---- encoder (`deformable_transformer.py:648-691`): fusion -> text
        # enhance -> deformable layer, per layer
        out = src
        for i in range(self.enc_layers):
            out, txt = BiAttentionBlock(
                C, C, self.ffn_dim // 2, self.heads // 2, dtype=self.dtype,
                name=f"fusion_{i}")(out, txt, text_pad)
            txt = TextEnhanceLayer(
                C, self.heads // 2, self.ffn_dim // 2, dtype=self.dtype,
                name=f"text_{i}")(txt, pos_text, text_self_mask)
            out = DeformEncoderLayer(
                C, self.ffn_dim, self.levels, self.points, dtype=self.dtype,
                name=f"enc_{i}")(out, pos, enc_ref, spatial_shapes)
        memory = out

        # ---- shared heads (dec_pred_*_embed_share = True in the build)
        bbox_embed = MLP(C, 4, 3, dtype=self.dtype, name="bbox_embed")
        pose_embed = MLP(C, 2, 3, dtype=self.dtype, name="pose_embed")
        pose_hw_embed = MLP(C, 2, 3, dtype=self.dtype, name="pose_hw_embed")
        ref_point_head = MLP(C, C, 2, dtype=self.dtype, name="ref_point_head")

        # ---- two-stage proposal selection (`deformable_transformer.py:386-437`)
        out_mem, out_prop = gen_encoder_output_proposals(memory, spatial_shapes)
        out_mem = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="enc_output_norm")(
            nn.Dense(C, dtype=self.dtype, name="enc_output")(out_mem))
        enc_logits = contrastive_logits(out_mem, txt, text_token_mask)
        enc_coord = bbox_embed(out_mem) + out_prop  # unsigmoid
        topk = jax.lax.top_k(jnp.max(enc_logits, -1), self.num_queries)[1]
        refpoint = jnp.take_along_axis(
            enc_coord, jnp.repeat(topk[..., None], 4, axis=-1), axis=1)
        refpoint = jax.lax.stop_gradient(refpoint)
        tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0), (self.num_queries, C))
        tgt = jnp.broadcast_to(
            tgt_embed[None], (B, self.num_queries, C)).astype(self.dtype)

        # group-isolated mask for the expanded phase
        kpt_mask = jnp.concatenate(
            [jnp.ones((B, 1), kpt_vis.dtype), kpt_vis], axis=-1)  # (B, slots)
        attn_mask2 = keypoint_group_mask(kpt_mask, G)[:, None]  # (B,1,n,n)

        # ---- decoder (`deformable_transformer.py:775-943`)
        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        hw = self.param("hw", nn.initializers.normal(1.0), (17, 2))
        hw_append = self.param(
            "hw_append", nn.initializers.normal(1.0), (K - 17, 2))
        kpt_index = np.asarray(
            [x for x in range(G * slots) if x % slots != 0], np.int32)

        output = tgt
        reference_points = jax.nn.sigmoid(refpoint)
        intermediate, ref_list = [], [reference_points]
        sa_mask = None
        for layer_id in range(self.dec_layers):
            ref_input = jnp.broadcast_to(
                reference_points[:, :, None],
                reference_points.shape[:2] + (self.levels, 4))
            query_sine = gen_sineembed_for_position(reference_points).astype(self.dtype)
            query_pos = ref_point_head(query_sine)

            output = DeformDecoderLayer(
                C, self.heads, self.ffn_dim, self.levels, self.points,
                dtype=self.dtype, name=f"dec_{layer_id}")(
                output, query_pos, ref_input, memory, spatial_shapes,
                txt, text_pad, self_attn_mask=sa_mask)
            intermediate.append(decoder_norm(output))

            if layer_id < self.num_box_decoder_layers:
                ref_uns = inverse_sigmoid(reference_points)
                new_ref = jax.nn.sigmoid(bbox_embed(output) + ref_uns)

            if layer_id == self.num_box_decoder_layers - 1:
                # expand top-G instances into (box + K keypoint) query groups
                cls = contrastive_logits(output, txt, text_token_mask)
                topg = jax.lax.top_k(jnp.max(cls, -1), G)[1]  # (B, G)
                box_ref = jnp.take_along_axis(
                    new_ref, jnp.repeat(topg[..., None], 4, axis=-1), axis=1)
                box_out = jnp.take_along_axis(
                    output, jnp.repeat(topg[..., None], C, axis=-1), axis=1)
                kpt_feat = jnp.broadcast_to(
                    kpt_embed[:, None], (B, G, K, C))  # queries = text embeds
                delta_xy = pose_embed(kpt_feat)[..., :2]
                kpt_xy = jax.nn.sigmoid(
                    inverse_sigmoid(box_ref[..., :2])[:, :, None] + delta_xy)
                hw_all = jax.nn.sigmoid(jnp.concatenate([hw, hw_append], 0))
                kpt_wh = hw_all[None, None] * box_ref[..., 2:][:, :, None]
                kpt_ref = jnp.concatenate([kpt_xy, kpt_wh], -1)  # (B,G,K,4)
                new_ref = jnp.concatenate(
                    [box_ref[:, :, None], kpt_ref], axis=2).reshape(B, G * slots, 4)
                output = jnp.concatenate(
                    [box_out[:, :, None], kpt_feat], axis=2).reshape(B, G * slots, C)
                sa_mask = attn_mask2

            if layer_id >= self.num_box_decoder_layers:
                ref_uns = inverse_sigmoid(reference_points)
                out_box = output[:, 0::slots]
                new_box = jax.nn.sigmoid(
                    bbox_embed(out_box) + ref_uns[:, 0::slots])
                out_kpt = output[:, kpt_index]
                d_xy = pose_embed(out_kpt)
                d_hw = pose_hw_embed(out_kpt)
                uns_kpt = ref_uns[:, kpt_index]
                uns_kpt = jnp.concatenate(
                    [uns_kpt[..., :2] + d_xy[..., :2], uns_kpt[..., 2:] + d_hw], -1)
                kpt_ref = jax.nn.sigmoid(uns_kpt).reshape(B, G, K, 4)
                new_ref = jnp.concatenate(
                    [new_box[:, :, None], kpt_ref], axis=2).reshape(B, G * slots, 4)

            reference_points = jax.lax.stop_gradient(new_ref)
            ref_list.append(new_ref)

        # ---- final outputs (`unipose.py:431-497`, last decoder layer only)
        hs = intermediate[-1]
        ref_in = ref_list[-2]  # reference entering the last layer
        hs_box = hs[:, 0::slots]
        ref_box = ref_in[:, 0::slots]
        pred_boxes = jax.nn.sigmoid(bbox_embed(hs_box) + inverse_sigmoid(ref_box))
        pred_logits = contrastive_logits(hs_box, txt, text_token_mask)
        hs_kpt = hs[:, kpt_index]
        ref_kpt = ref_in[:, kpt_index]
        kpt_xy_uns = pose_embed(hs_kpt) + inverse_sigmoid(ref_kpt[..., :2])
        xyv = jax.nn.sigmoid(jnp.concatenate(
            [kpt_xy_uns, jnp.ones_like(kpt_xy_uns[..., :1])], -1))
        xyv = xyv.reshape(B, G, K * 3)
        xy, z = keypoint_xyzxyz_to_xyxyzz(xyv)
        pred_keypoints = jnp.concatenate([xy, z], -1)
        return {
            "pred_logits": pred_logits,
            "pred_boxes": pred_boxes,
            "pred_keypoints": pred_keypoints,
        }


# ---------------------------------------------------------------------------
# host-side postprocess (sigmoid threshold + NMS — torchvision-free rebuild of
# `inference_xpose_on_video.py:785-850`)
# ---------------------------------------------------------------------------


def postprocess(outputs, num_keypoints: int, score_threshold: float = 0.3,
                iou_threshold: float = 0.9):
    """outputs: dict from UniPose.__call__; returns per-image dicts."""
    logits = np.asarray(outputs["pred_logits"], np.float32)  # (B, G, N)
    boxes = np.asarray(outputs["pred_boxes"], np.float32)  # (B, G, 4) cxcywh
    kpts = np.asarray(outputs["pred_keypoints"], np.float32)  # (B, G, 3K)
    results = []
    for b in range(logits.shape[0]):
        scores = 1.0 / (1.0 + np.exp(-logits[b].max(-1)))
        keep = scores > score_threshold
        bsel, ssel = boxes[b][keep], scores[keep]
        ksel = kpts[b][keep][:, : 2 * num_keypoints].reshape(-1, num_keypoints, 2)
        order = np.argsort(-ssel)
        bsel, ssel, ksel = bsel[order], ssel[order], ksel[order]
        picked = []
        for i in range(len(bsel)):
            if all(_iou_cxcywh(bsel[i], bsel[j]) <= iou_threshold for j in picked):
                picked.append(i)
        results.append({"scores": ssel[picked], "boxes": bsel[picked],
                        "keypoints": ksel[picked]})
    return results


def _iou_cxcywh(a, b) -> float:
    def to_xyxy(v):
        cx, cy, w, h = v
        return cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2

    ax0, ay0, ax1, ay1 = to_xyxy(a)
    bx0, by0, bx1, by1 = to_xyxy(b)
    ix = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    iy = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = ix * iy
    ua = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / max(ua, 1e-9)
