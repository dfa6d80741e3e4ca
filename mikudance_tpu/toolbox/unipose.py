"""UniPose: open-vocabulary keypoint detector, Flax.

Rebuilds the architecture of `/root/reference/src/XPose/models/UniPose/
unipose.py:35,316` + `deformable_transformer.py:38`: a DETR-style detector
whose class/keypoint vocabulary comes from CLIP text embeddings.

Structure (config_model/UniPose_SwinT.py: hidden 256, 6 enc + 6 dec layers,
8 heads, 4 feature levels, 4 sampling points, 900 queries, dim_feedforward
2048):

  Swin-T -> 4-level feature pyramid (stage 1..3 + stride-2 extra) -> 1x1 proj
  to 256 + GroupNorm(32) -> deformable ENCODER (MSDeformAttn self-attention
  over the flattened multi-scale tokens + text fusion) -> two-stage proposal
  selection (top num_queries encoder tokens) -> deformable DECODER whose
  queries are [instance | keypoint-slot] groups isolated by a block-diagonal
  self-attention mask (`mask_generate.py:10-43`) -> per-layer heads: class
  logits = <feature, text embedding>, box MLP, keypoint MLP.

This is a structurally faithful compact implementation (text fusion uses
bidirectional cross-attention like `fuse_modules.py:100,243`; drop-path and
checkpointing elided). Inference-only for now (used for pose extraction).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .deformable import ms_deform_attn
from .swin import SwinTransformer


def sine_position_embedding(h: int, w: int, dim: int = 256, temp: float = 20.0) -> np.ndarray:
    """DETR sine PE, (h*w, dim) — position_encoding.py with temperature 20."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ys = (ys + 0.5) / h * 2 * math.pi
    xs = (xs + 0.5) / w * 2 * math.pi
    half = dim // 2
    freqs = temp ** (2 * (np.arange(half) // 2) / half)
    py = ys[..., None] / freqs
    px = xs[..., None] / freqs
    pe_y = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], -1).reshape(h, w, half)
    pe_x = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], -1).reshape(h, w, half)
    return np.concatenate([pe_y, pe_x], -1).reshape(h * w, dim).astype(np.float32)


class MSDeformAttnLayer(nn.Module):
    """Learned sampling offsets + attention weights around reference points
    (`ops/modules/ms_deform_attn.py:33,83-143`)."""

    dim: int = 256
    heads: int = 8
    levels: int = 4
    points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        ref_points: jnp.ndarray,  # (B, Q, L, 2) normalized centers
        value: jnp.ndarray,  # (B, S, C)
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jnp.ndarray:
        B, Q, C = query.shape
        Hh, L, P = self.heads, self.levels, self.points
        v = nn.Dense(C, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(B, -1, Hh, C // Hh)

        off = nn.Dense(Hh * L * P * 2, dtype=self.dtype, name="sampling_offsets")(query)
        off = off.reshape(B, Q, Hh, L, P, 2)
        attn = nn.Dense(Hh * L * P, dtype=self.dtype, name="attention_weights")(query)
        attn = nn.softmax(attn.reshape(B, Q, Hh, L * P), axis=-1).reshape(B, Q, Hh, L, P)

        wh = jnp.asarray([[s[1], s[0]] for s in spatial_shapes], jnp.float32)  # (L, 2) x,y
        loc = ref_points[:, :, None, :, None, :] + off / wh[None, None, None, :, None, :]
        out = ms_deform_attn(v, spatial_shapes, loc, attn)
        return nn.Dense(C, dtype=self.dtype, name="output_proj")(out)


class TextFusion(nn.Module):
    """Bidirectional image<->text cross-attention (fuse_modules.py:100,243)."""

    dim: int = 256
    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, txt: jnp.ndarray):
        from ..models.layers import dot_product_attention

        i_n = nn.LayerNorm(dtype=self.dtype, name="ln_img")(img)
        t_n = nn.LayerNorm(dtype=self.dtype, name="ln_txt")(txt)
        qi = nn.Dense(self.dim, dtype=self.dtype, name="img_q")(i_n)
        kt = nn.Dense(self.dim, dtype=self.dtype, name="txt_k")(t_n)
        vt = nn.Dense(self.dim, dtype=self.dtype, name="txt_v")(t_n)
        img = img + nn.Dense(self.dim, dtype=self.dtype, name="img_o")(
            dot_product_attention(qi, kt, vt, self.heads)
        )
        qt = nn.Dense(self.dim, dtype=self.dtype, name="txt_q")(t_n)
        ki = nn.Dense(self.dim, dtype=self.dtype, name="img_k")(i_n)
        vi = nn.Dense(self.dim, dtype=self.dtype, name="img_v")(i_n)
        txt = txt + nn.Dense(self.dim, dtype=self.dtype, name="txt_o")(
            dot_product_attention(qt, ki, vi, self.heads)
        )
        return img, txt


class FFN(nn.Module):
    dim: int = 256
    hidden: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class EncoderLayer(nn.Module):
    dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, pos, ref_points, spatial_shapes, txt):
        tokens, txt = TextFusion(self.dim, dtype=self.dtype, name="fusion")(tokens, txt)
        attn = MSDeformAttnLayer(self.dim, dtype=self.dtype, name="self_attn")(
            tokens + pos, ref_points, tokens, spatial_shapes
        )
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm1")(tokens + attn)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            FFN(self.dim, dtype=self.dtype, name="ffn")(tokens)
        )
        return tokens, txt


class DecoderLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, q_pos, sa_mask, memory, ref_points, spatial_shapes):
        from ..models.layers import dot_product_attention

        # group-isolated self-attention (mask_generate.py:10-43)
        h = q + q_pos
        qq = nn.Dense(self.dim, dtype=self.dtype, name="sa_q")(h)
        kk = nn.Dense(self.dim, dtype=self.dtype, name="sa_k")(h)
        vv = nn.Dense(self.dim, dtype=self.dtype, name="sa_v")(q)
        B, Q, C = q.shape
        hd = C // self.heads
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            qq.reshape(B, Q, self.heads, hd),
            kk.reshape(B, Q, self.heads, hd),
        ) / math.sqrt(hd)
        logits = jnp.where(sa_mask[None, None], -1e30, logits)
        w = nn.softmax(logits, axis=-1)
        sa = jnp.einsum("bhqk,bkhd->bqhd", w, vv.reshape(B, Q, self.heads, hd))
        sa = nn.Dense(self.dim, dtype=self.dtype, name="sa_o")(sa.reshape(B, Q, C))
        q = nn.LayerNorm(dtype=self.dtype, name="norm1")(q + sa)

        ca = MSDeformAttnLayer(self.dim, dtype=self.dtype, name="cross_attn")(
            q + q_pos, ref_points, memory, spatial_shapes
        )
        q = nn.LayerNorm(dtype=self.dtype, name="norm2")(q + ca)
        q = nn.LayerNorm(dtype=self.dtype, name="norm3")(
            FFN(self.dim, dtype=self.dtype, name="ffn")(q)
        )
        return q


def keypoint_group_mask(num_groups: int, slots_per_group: int) -> np.ndarray:
    """Block-diagonal mask: True = BLOCKED. Queries attend within their own
    (instance, keypoints) group only (`mask_generate.py:10-43`)."""
    n = num_groups * slots_per_group
    g = np.arange(n) // slots_per_group
    return (g[:, None] != g[None, :])


class UniPose(nn.Module):
    """Open-vocabulary keypoint detector. Inference forward."""

    hidden_dim: int = 256
    enc_layers: int = 6
    dec_layers: int = 6
    heads: int = 8
    levels: int = 4
    points: int = 4
    num_groups: int = 50  # instances (num_select)
    num_body_points: int = 68  # keypoint slots per instance (padded vocab)
    text_dim: int = 512  # CLIP ViT-B/32 text width
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,  # (B, H, W, 3), normalized
        instance_text: jnp.ndarray,  # (B, N_cls, text_dim) CLIP embeddings
        keypoint_text: jnp.ndarray,  # (B, K, text_dim) CLIP embeddings
    ):
        B = image.shape[0]
        C = self.hidden_dim

        # ---- backbone + 4-level pyramid (input_proj, unipose.py:378-398)
        feats = SwinTransformer(dtype=self.dtype, name="backbone")(image)
        levels = []
        for i, f in enumerate(feats):
            p = nn.Conv(C, (1, 1), dtype=self.dtype, name=f"input_proj_{i}")(f)
            p = nn.GroupNorm(32, dtype=self.dtype, name=f"input_proj_norm_{i}")(p)
            levels.append(p)
        extra = nn.Conv(C, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="input_proj_extra")(feats[-1])
        extra = nn.GroupNorm(32, dtype=self.dtype, name="input_proj_extra_norm")(extra)
        levels.append(extra)

        spatial_shapes = [(f.shape[1], f.shape[2]) for f in levels]
        tokens = jnp.concatenate([f.reshape(B, -1, C) for f in levels], axis=1)
        pos = jnp.concatenate(
            [jnp.asarray(sine_position_embedding(h, w, C)) for h, w in spatial_shapes],
            axis=0,
        )[None].astype(self.dtype)
        lvl_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.levels, C)
        )
        lvl_pos = jnp.concatenate(
            [jnp.broadcast_to(lvl_embed[i], (h * w, C)) for i, (h, w) in enumerate(spatial_shapes)],
            axis=0,
        )[None].astype(self.dtype)
        pos = pos + lvl_pos

        # per-token reference points = own center in every level
        centers = []
        for h, w in spatial_shapes:
            ys, xs = np.meshgrid(
                (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
            )
            centers.append(np.stack([xs.ravel(), ys.ravel()], -1))
        centers = jnp.asarray(np.concatenate(centers, 0), jnp.float32)  # (S, 2)
        enc_ref = jnp.broadcast_to(centers[None, :, None], (B, centers.shape[0], self.levels, 2))

        # ---- text projections (unipose.py:332-344)
        inst_txt = nn.Dense(C, dtype=self.dtype, name="instance_text_proj")(instance_text)
        kpt_txt = nn.Dense(C, dtype=self.dtype, name="keypoint_text_proj")(keypoint_text)
        txt = jnp.concatenate([inst_txt, kpt_txt], axis=1)

        # ---- deformable encoder
        for i in range(self.enc_layers):
            tokens, txt = EncoderLayer(C, dtype=self.dtype, name=f"enc_{i}")(
                tokens, pos, enc_ref, spatial_shapes, txt
            )

        # ---- two-stage proposal selection (top num_groups tokens by class score)
        enc_cls = jnp.einsum(
            "bsc,bnc->bsn",
            nn.LayerNorm(dtype=self.dtype, name="enc_out_norm")(tokens),
            inst_txt,
        )
        score = jnp.max(enc_cls, axis=-1)  # (B, S)
        top = jax.lax.top_k(score, self.num_groups)[1]  # (B, G)
        sel_centers = jnp.take_along_axis(
            jnp.broadcast_to(centers[None], (B,) + centers.shape), top[..., None], axis=1
        )  # (B, G, 2)

        # ---- decoder queries: [instance | 68 keypoint slots] per group
        slots = 1 + self.num_body_points
        Qn = self.num_groups * slots
        q_embed = self.param("query_embed", nn.initializers.normal(1.0), (slots, C))
        q = jnp.broadcast_to(q_embed[None, None], (B, self.num_groups, slots, C))
        q = q.reshape(B, Qn, C).astype(self.dtype)
        q_pos = jnp.zeros_like(q)
        ref = jnp.repeat(sel_centers, slots, axis=1)  # (B, Qn, 2)
        ref_l = jnp.broadcast_to(ref[:, :, None], (B, Qn, self.levels, 2))

        sa_mask = jnp.asarray(keypoint_group_mask(self.num_groups, slots))

        outputs = []
        for i in range(self.dec_layers):
            q = DecoderLayer(C, self.heads, dtype=self.dtype, name=f"dec_{i}")(
                q, q_pos, sa_mask, tokens, ref_l, spatial_shapes
            )
            qg = q.reshape(B, self.num_groups, slots, C)
            inst_feat = qg[:, :, 0]  # (B, G, C)
            kpt_feat = qg[:, :, 1:]  # (B, G, K, C)
            cls_logits = jnp.einsum("bgc,bnc->bgn", inst_feat, inst_txt)
            box = nn.Dense(4, dtype=self.dtype, name=f"box_head_{i}")(
                nn.relu(nn.Dense(C, dtype=self.dtype, name=f"box_mlp_{i}")(inst_feat))
            )
            box = nn.sigmoid(box + jnp.concatenate(
                [sel_centers, jnp.zeros_like(sel_centers)], -1))
            kpt = nn.Dense(2, dtype=self.dtype, name=f"kpt_head_{i}")(
                nn.relu(nn.Dense(C, dtype=self.dtype, name=f"kpt_mlp_{i}")(kpt_feat))
            )
            kpt = nn.sigmoid(kpt + sel_centers[:, :, None])
            outputs.append({"logits": cls_logits, "boxes": box, "keypoints": kpt})
        return outputs


def postprocess(
    outputs, score_threshold: float = 0.3, iou_threshold: float = 0.9
):
    """sigmoid-threshold + IoU NMS over instances
    (`inference_xpose_on_video.py:785-850`); host-side numpy."""
    final = outputs[-1]
    logits = np.asarray(final["logits"])  # (B, G, N)
    boxes = np.asarray(final["boxes"])  # (B, G, 4) cxcywh
    kpts = np.asarray(final["keypoints"])  # (B, G, K, 2)
    results = []
    for b in range(logits.shape[0]):
        scores = 1 / (1 + np.exp(-logits[b].max(-1)))
        keep = scores > score_threshold
        idx = np.argsort(-scores[keep])
        bsel = boxes[b][keep][idx]
        ksel = kpts[b][keep][idx]
        ssel = scores[keep][idx]
        picked = []
        for i in range(len(bsel)):
            ok = True
            for j in picked:
                if _iou_cxcywh(bsel[i], bsel[j]) > iou_threshold:
                    ok = False
                    break
            if ok:
                picked.append(i)
        results.append(
            {"scores": ssel[picked], "boxes": bsel[picked], "keypoints": ksel[picked]}
        )
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
