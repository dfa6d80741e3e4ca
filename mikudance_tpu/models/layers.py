"""Shared Flax layers: time embeddings, attention, transformer blocks.

The reference-attention "bank" mechanism is rebuilt functionally (no monkey
patching): write-mode blocks *return* their normed hidden states; read-mode
blocks take the reference features as an explicit argument and use
``norm_h + ref`` as the K/V sequence of self-attention — the additive
injection of ``/root/reference/src/models/mutual_mix_attention.py:169-180``.
The CFG-uncond bypass (``:181-201``, plain self-attention for the uncond
half) is equivalent to injecting ``ref = 0`` for that half, so one fused
attention covers both halves.

All token tensors are (B, S, C); all image tensors are NHWC.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, matching diffusers ``Timesteps``.

    timesteps: (B,) float or int; returns (B, dim) float32.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbed(nn.Module):
    """linear -> silu -> linear (diffusers ``TimestepEmbedding``)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
) -> jnp.ndarray:
    """Multi-head attention on (B, S, C) tensors with fp32 softmax.

    The XLA path; the Pallas flash kernel (kernels/flash_attention.py) replaces
    this on TPU for long sequences via `attention_backend`.

    4D inputs (B, T, P, C) mean per-position temporal attention (the motion
    module's native layout) — attend over axis 1 independently per position p.
    """
    if q.ndim == 4:
        from ..kernels.temporal_attention import temporal_attention_xla

        return temporal_attention_xla(q, k, v, heads)
    B, Sq, C = q.shape
    Sk = k.shape[1]
    head_dim = C // heads
    scale = 1.0 / math.sqrt(head_dim)

    q = q.reshape(B, Sq, heads, head_dim)
    k = k.reshape(B, Sk, heads, head_dim)
    v = v.reshape(B, Sk, heads, head_dim)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return out.reshape(B, Sq, C)


# Set by kernels.flash_attention at import time when the Pallas path is usable.
_ATTENTION_IMPL = {"fn": dot_product_attention}


def set_attention_impl(fn) -> None:
    _ATTENTION_IMPL["fn"] = fn


def run_attention(q, k, v, heads):
    return _ATTENTION_IMPL["fn"](q, k, v, heads)


class FusedGroupNorm(nn.Module):
    """Drop-in for ``nn.GroupNorm`` (same param names/shapes) that runs the
    two-pass Pallas kernel when ``kernels.group_norm.PREFER_PALLAS`` is set
    (currently off: XLA's lowering measures faster end-to-end in the tightened
    denoise loop — see that module's dispatch note)."""

    num_groups: int
    epsilon: float = 1e-5
    act: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..kernels.group_norm import fused_group_norm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return fused_group_norm(
            x, scale, bias, self.num_groups, self.epsilon, self.act
        ).astype(self.dtype)


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` (same param names/shapes: scale, bias)
    that runs the Pallas row-major kernel when
    ``kernels.layer_norm.PREFER_PALLAS`` is set. ``dim`` may be left 0 only
    when the module is always called (shape inferred at first call is not
    supported by setup-style params, so all call sites pass their width)."""

    dim: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.dim,), jnp.float32)
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), jnp.float32)

    def weights(self):
        return self.scale, self.bias

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..kernels import layer_norm as _ln

        if _ln.PREFER_PALLAS:
            return _ln.fused_layer_norm(
                x, self.scale, self.bias, self.epsilon).astype(self.dtype)
        # flax-style fast variance (E[x^2] - E[x]^2): ONE data pass for the
        # stats — the two-pass layer_norm_ref cost ~20 ms/step at 768^2
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon) * self.scale + self.bias
        return y.astype(self.dtype)


# MEASURED AND REJECTED (round 3, real chip): flattening every Dense operand
# to 2-D before the dot looked attractive — xprof showed N-D projection dots
# conv-ified with windows like {size=32 pad=31_31 rhs_reversal=1} — but the
# 4-step denoise got SLOWER with it (4.36 s vs 4.09 s): XLA's conv-encoded
# dots execute the token-minor layouts (propagated from the attention custom
# calls) cheaper than the explicit reshape->matmul->reshape chain the 2-D
# form forces. Keep False; the flag stays for probes.
DENSE_2D = False

# Narrower probe: flatten ONLY the 4-D (B, T, P, C) motion-module operands
# (xprof round 4: their dots conv-ify over the (B, T) dims with windows like
# {size=2x16 pad=1_1x15_15 rhs_reversal} — padded-window MXU waste the 3-D
# spatial dots don't pay). Toggled via MD_DENSE_2D_4D for A/B on the chip.
import os as _os

DENSE_2D_4D = _os.environ.get("MD_DENSE_2D_4D", "0") == "1"

# Route the read-mode TransformerBlock interior through an unbroken row-major
# Pallas chain (see TransformerBlock._chain). A/B knob for the real chip.
PALLAS_CHAIN = _os.environ.get("MD_PALLAS_CHAIN", "0") == "1"

# W8A8 dynamic-int8 projection/FF dots (VERDICT r4 #2): v5e's int8 MXU peak
# is 2x bf16, and the projection/FF dot region is pinned at ~25 TF/s bf16
# across five rejected bf16-shape experiment families. Both operands quantize
# to int8 (weights per-output-channel — loop-invariant, LICM-hoisted out of
# the step scan; activations per-token dynamic abs-max) and the dot
# accumulates int32. Quality-gated by the SD-width PSNR methodology
# (PSNR_SD.json); accept/reject recorded in PROFILE.md.
#   "ff"   = GEGLU feed-forward dots only (the widest, most int8-tolerant)
#   "proj" = ff + attention q/k/v/out projections
#   "all"  = proj + spatial-transformer proj_in/proj_out
INT8_DOTS = _os.environ.get("MD_INT8_DOTS", "off")


def int8_dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``x @ w`` on the int8 MXU: per-token dynamic activation scales,
    per-output-channel weight scales, int32 accumulation, fp32 rescale.
    x: (..., K); w: (K, N). Returns fp32 (caller casts)."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.round(xf / sx).astype(jnp.int8)
    wf = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-8) / 127.0
    wq = jnp.round(wf / sw).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * sx * sw


def _flatten_for_dot(ndim: int) -> bool:
    return DENSE_2D or (DENSE_2D_4D and ndim == 4)


class _Int8Dense(nn.Dense):
    """``nn.Dense`` twin (same param tree: kernel, bias) that runs the dot on
    the int8 MXU — the INT8_DOTS="all" tier for proj_in/proj_out."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            self.param_dtype,
        )
        y = int8_dot(x, kernel)
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype)
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


def proj_dense(features: int, dtype, name: str, **kw) -> nn.Dense:
    """``nn.Dense`` factory for the 1x1-conv projections (proj_in/proj_out):
    swaps in the int8-MXU twin under INT8_DOTS="all". Flax registers module
    names at construction, so the choice must happen before the ctor."""
    cls = _Int8Dense if INT8_DOTS == "all" else nn.Dense
    return cls(features, dtype=dtype, name=name, **kw)


def dense_2d(layer: nn.Dense, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a channel ``Dense`` on flattened 2-D ``(tokens, C)`` operands
    when ``DENSE_2D`` (all) or ``DENSE_2D_4D`` (4-D motion-module tensors
    only) is set — see the rejection/probe notes above; otherwise the Dense
    consumes the N-D operand directly."""
    if x.ndim <= 2 or not _flatten_for_dot(x.ndim):
        return layer(x)
    shape = x.shape
    y = layer(x.reshape(-1, shape[-1]))
    return y.reshape(shape[:-1] + (y.shape[-1],))


# MEASURED AND REJECTED (round 4, real chip): fusing q/k/v projections into
# one ``dot(x, concat(Wq, Wk, Wv))`` MXU pass. The dot-of-concat pattern
# sends XLA:TPU's compile time pathological — the tiny 192^2 denoise program
# went 207 s -> 977 s, the full 768^2 one from ~10 min to >35 min (never
# finished) — and the K/V *hoisting* (the real per-step win) does not need
# it. The flag keeps the fused path buildable for re-probes.
FUSE_PROJ = False


class AttnProj(nn.Module):
    """Parameter-only projection mirroring ``nn.Dense``'s param tree
    ({kernel[, bias]}) so converted SD checkpoints are unchanged; the matmul
    itself is owned by ``Attention`` (one place to hoist/fuse projections —
    see ``FUSE_PROJ`` and ``Attention.project_kv``)."""

    in_dim: int
    out_dim: int
    use_bias: bool = False

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.out_dim),
            jnp.float32,
        )
        self.bias = (
            self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
            if self.use_bias
            else None
        )


class Attention(nn.Module):
    """diffusers-style Attention: to_q/to_k/to_v (no bias), to_out (bias).

    ``kv_dim`` differs from ``dim`` for cross-attention (CLIP context: 768).

    Projections sharing an input run as ONE fused matmul (q/k/v for plain
    self-attention, k/v otherwise — see ``AttnProj``). Two hooks hoist
    step-invariant work out of the denoise scan (both step-invariant per the
    reference's own semantics — banks depend only on the t=0 condition stack,
    `mutual_mix_attention.py:130-201`, and the CLIP context never changes
    across steps, `pipeline_mikudance.py:592-667`):

    - ``extra_kv=(k_add, v_add)``: precomputed reference-bank K/V added to the
      self-attention K/V *projections*. Linearity makes this the additive
      injection ``W(norm_h + ref) = W(norm_h) + W(ref)`` with the ``W(ref)``
      half computed once per clip instead of once per step.
    - ``kv=(k, v)``: precomputed K/V replacing the projections entirely
      (hoisted cross-attention context K/V).
    """

    dim: int
    heads: int
    kv_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.dim
        kin = self.kv_dim or d
        self.to_q = AttnProj(d, d, False, name="to_q")
        self.to_k = AttnProj(kin, d, False, name="to_k")
        self.to_v = AttnProj(kin, d, False, name="to_v")
        self.to_out = AttnProj(d, d, True, name="to_out")

    def _mm(self, x: jnp.ndarray, *kernels, bias=None) -> jnp.ndarray:
        if INT8_DOTS in ("proj", "all") and len(kernels) == 1:
            y = int8_dot(x, kernels[0])
            if bias is not None:
                y = y + bias.astype(jnp.float32)
            return y.astype(self.dtype)
        w = kernels[0] if len(kernels) == 1 else jnp.concatenate(kernels, axis=1)
        xc = x.astype(self.dtype)
        if _flatten_for_dot(x.ndim) and x.ndim > 2:
            y = (xc.reshape(-1, x.shape[-1]) @ w.astype(self.dtype)).reshape(
                x.shape[:-1] + (w.shape[-1],)
            )
        else:
            y = xc @ w.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y

    def proj_weights(self):
        """Raw projection weights for the Pallas-chain path (TransformerBlock
        orchestrates the matmuls through row-major kernels there)."""
        return (self.to_q.kernel, self.to_k.kernel, self.to_v.kernel,
                self.to_out.kernel, self.to_out.bias)

    def project_kv(self, ctx: jnp.ndarray):
        """The K/V projections alone — the step-invariant half that callers
        hoist out of the denoise scan (used by the ``precompute_*_kv``
        helpers in models/unet.py)."""
        if FUSE_PROJ:
            kv = self._mm(ctx, self.to_k.kernel, self.to_v.kernel)
            k, v = jnp.split(kv, 2, axis=-1)
            return k, v
        return self._mm(ctx, self.to_k.kernel), self._mm(ctx, self.to_v.kernel)

    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        extra_kv=None,
        kv=None,
    ):
        if kv is not None:
            q = self._mm(x, self.to_q.kernel)
            k, v = kv
            k, v = k.astype(q.dtype), v.astype(q.dtype)
        elif context is not None:
            q = self._mm(x, self.to_q.kernel)
            k, v = self.project_kv(context)
        else:
            if FUSE_PROJ:
                q, k, v = jnp.split(
                    self._mm(x, self.to_q.kernel, self.to_k.kernel,
                             self.to_v.kernel),
                    3, axis=-1,
                )
            else:
                q = self._mm(x, self.to_q.kernel)
                k = self._mm(x, self.to_k.kernel)
                v = self._mm(x, self.to_v.kernel)
            if extra_kv is not None:
                k = k + extra_kv[0].astype(k.dtype)
                v = v + extra_kv[1].astype(v.dtype)
        out = run_attention(q, k, v, self.heads)
        return self._mm(out, self.to_out.kernel, bias=self.to_out.bias)


class GEGLUFeedForward(nn.Module):
    """dim -> 4*dim GEGLU -> dim (diffusers ``FeedForward`` with geglu)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        inner = self.dim * self.mult
        self.proj = AttnProj(self.dim, inner * 2, True, name="proj")
        self.out = AttnProj(inner, self.dim, True, name="out")

    def _mm(self, x, p: AttnProj) -> jnp.ndarray:
        if INT8_DOTS in ("ff", "proj", "all"):
            y = int8_dot(x, p.kernel) + p.bias.astype(jnp.float32)
            return y.astype(self.dtype)
        xc = x.astype(self.dtype)
        w = p.kernel.astype(self.dtype)
        if _flatten_for_dot(x.ndim) and x.ndim > 2:
            y = (xc.reshape(-1, x.shape[-1]) @ w).reshape(
                x.shape[:-1] + (w.shape[-1],))
        else:
            y = xc @ w
        return y + p.bias.astype(self.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden, gate = jnp.split(self._mm(x, self.proj), 2, axis=-1)
        x = hidden * nn.gelu(gate, approximate=False)
        return self._mm(x, self.out)


class TransformerBlock(nn.Module):
    """Basic transformer block: self-attn (+ reference injection) / cross / FF.

    - ``write=True`` (guidance UNet): returns ``(x, norm_h)`` where norm_h is
      the bank entry (`mutual_mix_attention.py:140`).
    - ``ref`` given (denoising UNet): K/V = norm_h + ref (`:169-180`). Passing
      ``ref=None`` or zeros yields plain self-attention (the uncond/no-ref path).
    """

    dim: int
    heads: int
    cross_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    # nested remat: bound the backward working set of the 4x-width GEGLU
    # (its (tokens, 8*dim) intermediate is the largest activation at 576^2)
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        ref: Optional[jnp.ndarray] = None,
        write: bool = False,
        ref_kv=None,
        ctx_kv=None,
    ):
        FF = nn.remat(GEGLUFeedForward) if self.remat else GEGLUFeedForward
        norm1 = FusedLayerNorm(self.dim, 1e-5, dtype=self.dtype, name="norm1")
        attn1 = Attention(self.dim, self.heads, dtype=self.dtype, name="attn1")
        norm2_mod = FusedLayerNorm(self.dim, 1e-5, dtype=self.dtype, name="norm2")
        attn2 = Attention(
            self.dim, self.heads, kv_dim=self.cross_dim, dtype=self.dtype, name="attn2"
        )
        norm3_mod = FusedLayerNorm(self.dim, 1e-5, dtype=self.dtype, name="norm3")
        ffm = FF(self.dim, dtype=self.dtype, name="ff")

        if (PALLAS_CHAIN and not write and not self.remat and x.ndim == 3
                and ref is None and ctx_kv is not None):
            return self._chain(
                x, norm1, attn1, norm2_mod, attn2, norm3_mod, ffm,
                ref_kv, ctx_kv,
            ), None

        norm_h = norm1(x)
        bank_out = norm_h if write else None

        if ref_kv is not None:
            # banks precomputed through attn1's own K/V kernels (additive
            # injection in projected space; zeros for the uncond half)
            x = x + attn1(norm_h, extra_kv=ref_kv)
        elif ref is not None:
            x = x + attn1(norm_h, context=norm_h + ref)
        else:
            x = x + attn1(norm_h)

        norm2 = norm2_mod(x)
        x = x + attn2(norm2, context, kv=ctx_kv)

        norm3 = norm3_mod(x)
        x = x + ffm(norm3)
        return x, bank_out

    def _chain(self, x, norm1, attn1, norm2_mod, attn2, norm3_mod, ffm,
               ref_kv, ctx_kv):
        """The whole block interior as an UNBROKEN row-major Pallas chain
        (LN -> q/k/v matmuls -> flash attention -> out+residual -> LN ->
        cross-q -> attention -> out+residual -> LN -> GEGLU matmuls), so XLA
        never assigns token-minor layouts between the attention custom calls
        — the round-3 finding was that PIECEWISE Pallas replacement loses to
        the conv-anchored layout tax at each boundary; the chain leaves only
        the proj_in/proj_out boundaries to XLA. Same math as the standard
        path (kernels are parity-tested); inference-only (no remat path)."""
        from ..kernels.layer_norm import fused_layer_norm as pl_ln
        from ..kernels.linear import fused_linear

        B, S, C = x.shape
        dt = self.dtype
        x2 = x.reshape(B * S, C)
        s1, b1 = norm1.weights()
        hn = pl_ln(x2, s1, b1, 1e-5).astype(dt)
        wq, wk, wv, wo, bo = attn1.proj_weights()
        rk, rv = ref_kv if ref_kv is not None else (None, None)
        q = fused_linear(hn, wq, None)
        k = fused_linear(hn, wk, None,
                         None if rk is None else rk.reshape(B * S, C).astype(dt))
        v = fused_linear(hn, wv, None,
                         None if rv is None else rv.reshape(B * S, C).astype(dt))
        a1 = run_attention(q.reshape(B, S, C), k.reshape(B, S, C),
                           v.reshape(B, S, C), self.heads)
        x2 = fused_linear(a1.reshape(B * S, C), wo, bo, residual=x2)

        s2, b2 = norm2_mod.weights()
        n2 = pl_ln(x2, s2, b2, 1e-5).astype(dt)
        wq2, _, _, wo2, bo2 = attn2.proj_weights()
        q2 = fused_linear(n2, wq2, None)
        ck, cv = ctx_kv
        a2 = run_attention(q2.reshape(B, S, C), ck.astype(dt), cv.astype(dt),
                           self.heads)
        x2 = fused_linear(a2.reshape(B * S, C), wo2, bo2, residual=x2)

        s3, b3 = norm3_mod.weights()
        n3 = pl_ln(x2, s3, b3, 1e-5).astype(dt)
        hg = fused_linear(n3, ffm.proj.kernel, ffm.proj.bias)
        hidden, gate = jnp.split(hg, 2, axis=-1)
        hf = hidden * nn.gelu(gate, approximate=False)
        x2 = fused_linear(hf, ffm.out.kernel, ffm.out.bias, residual=x2)
        return x2.reshape(B, S, C)


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 conv proj_in -> TransformerBlock -> 1x1 proj_out (+res).

    Rebuilds ``Transformer2DModel`` (`/root/reference/src/models/transformer_2d.py:32`)
    / ``Transformer3DModel`` (frames folded into batch upstream).
    SD1.5 depth is 1 transformer block.
    """

    dim: int
    heads: int
    cross_dim: int = 768
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, H, W, C)
        context: jnp.ndarray,  # (B, S_ctx, cross_dim)
        ref: Optional[jnp.ndarray] = None,
        write: bool = False,
        ref_kv=None,
        ctx_kv=None,
    ):
        B, H, W, C = x.shape
        residual = x
        h = FusedGroupNorm(self.norm_groups, 1e-6, dtype=self.dtype, name="norm")(x)
        # SD1.5 uses a 1x1 conv projection (use_linear_projection=False); on a
        # NHWC token layout that's exactly a Dense over the channel axis.
        h = dense_2d(proj_dense(self.dim, self.dtype, "proj_in"), h)
        h = h.reshape(B, H * W, self.dim)
        h, bank = TransformerBlock(
            self.dim, self.heads, self.cross_dim, dtype=self.dtype,
            remat=self.remat, name="block"
        )(h, context, ref=ref, write=write, ref_kv=ref_kv, ctx_kv=ctx_kv)
        h = dense_2d(proj_dense(C, self.dtype, "proj_out"), h)
        h = h.reshape(B, H, W, C)
        return h + residual, bank
