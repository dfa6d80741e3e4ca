"""One-level transformer-block MEGA-KERNEL probe (VERDICT r4 #1b).

A single pallas_call spanning the whole read-mode block interior for ONE
representative UNet level (S=2304, C=640, heads=8, head_dim=80 — the
down_1/up_2 level of the 768^2 denoise):

    LN1 -> q/k/v (+bank K/V add) -> flash self-attn -> out-proj + residual
    -> LN2 -> cross-q -> cross-attn vs hoisted ctx K/V -> out + residual
    -> LN3 -> GEGLU FF -> out + residual

Everything between the HBM load of x and the HBM store of the block output
stays in VMEM: weights (~15 MB bf16) are grid-invariant and stay resident.
This is the "from-scratch full-block mega-kernel" named in the round-4
rejection notes as the one untried lever on the ~25 TF/s conv/dot region:
unlike the round-4 MD_PALLAS_CHAIN (separate kernels, HBM between stages,
4.27 s vs 4.085 s), NO intermediate ever touches HBM here.

VMEM forces a (B, q-tile) grid: one invocation holding all full-S
activations peaks at 215 MB of the chip's 128 MB VMEM (first chip attempt,
recorded), so each invocation recomputes LN1 + the k/v projections for the
full row (NQS=4x redundant kv-proj ~= +25% of block FLOPs — an inherent tax
of single-kernel fusion at this level) and runs q/cross/FF for its own
576-row tile. A production variant would split k/v projection into its own
kernel and pay one (S, C) bf16 HBM round-trip instead of the recompute.

Prints: parity vs the XLA TransformerBlock path, and A/B wall time for
B=32 batch rows (the headline CFG batch at this level).

Run: python probes/_mega_block.py   (real chip)
"""
import functools
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

S, C, HEADS = 2304, 640, 8
HD = C // HEADS  # 80
SC = 257  # CLIP context tokens (hoisted K/V)
SC_PAD = 320  # padded to a sublane multiple; padded rows masked in softmax
FF = 4 * C  # 2560
NQS = 4  # q-tile grid: each invocation runs S/NQS = 576 query rows
BQS = S // NQS
NFF = 3  # FF row sub-tiles inside a q-tile (bounds the (rows, 2*FF) f32)
NEG_INF = -1e30
_INTERPRET = False  # --selftest: CPU interpret mode


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _dot(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _attention(q, k, v, scale, neg=None):
    """Dense per-head attention: q (Sq, C) tile, k/v (Sk, C) VMEM values.
    One (Sq, Sk) f32 score matrix lives at a time (5.3 MB at the probe's
    576 x 2304 tile) — no online-softmax tiling needed at this tile size.
    Static Python head loop + static slices: this Pallas TPU lowering has
    no dynamic_slice inside kernels. ``neg`` adds a padding mask row."""
    outs = []
    for h in range(HEADS):
        qh = q[:, h * HD:(h + 1) * HD] * scale
        kh = k[:, h * HD:(h + 1) * HD]
        vh = v[:, h * HD:(h + 1) * HD]
        s = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if neg is not None:
            s = s + neg
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        outs.append(pv)
    return jnp.concatenate(outs, axis=1)


def _mega_kernel(x_full_ref, x_tile_ref, rk_ref, rv_ref, ck_ref, cv_ref,
                 wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
                 wq2_ref, wo2_ref, bo2_ref,
                 w1_ref, b1_ref, w2_ref, b2_ref,
                 s1_ref, g1_ref, s2_ref, g2_ref, s3_ref, g3_ref,
                 o_ref):
    scale = 1.0 / math.sqrt(HD)

    # --- full-row k/v (recomputed per q-tile; see module docstring), cast
    # to bf16 immediately: fp32 (S, C) temporaries blow the VMEM budget
    hn = _ln(x_full_ref[0], s1_ref[0], g1_ref[0]).astype(jnp.bfloat16)
    k = (_dot(hn, wk_ref[...])
         + rk_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    v = (_dot(hn, wv_ref[...])
         + rv_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)

    # --- this invocation's query tile: self-attention + residual
    x = x_tile_ref[0].astype(jnp.float32)  # (BQS, C)
    hn_t = _ln(x, s1_ref[0], g1_ref[0]).astype(jnp.bfloat16)
    q = _dot(hn_t, wq_ref[...]).astype(jnp.bfloat16)
    a1 = _attention(q, k, v, scale)
    x = x + _dot(a1.astype(jnp.bfloat16), wo_ref[...]) + bo_ref[0]

    # --- cross-attention vs hoisted ctx K/V (padded rows masked)
    neg = (1.0 - (jax.lax.broadcasted_iota(jnp.int32, (1, SC_PAD), 1)
                  < SC).astype(jnp.float32)) * NEG_INF
    n2 = _ln(x, s2_ref[0], g2_ref[0]).astype(jnp.bfloat16)
    q2 = _dot(n2, wq2_ref[...]).astype(jnp.bfloat16)
    a2 = _attention(q2, ck_ref[0], cv_ref[0], scale, neg=neg)
    x = x + _dot(a2.astype(jnp.bfloat16), wo2_ref[...]) + bo2_ref[0]

    # --- GEGLU feed-forward, row sub-tiles bound the (rows, 2*FF) f32.
    # erf has no Pallas TPU lowering; the tanh GELU approximation differs by
    # <1e-3 absolute — below bf16 output resolution for this timing probe.
    n3 = _ln(x, s3_ref[0], g3_ref[0]).astype(jnp.bfloat16)
    c0, c1 = np.float32(0.7978845608028654), np.float32(0.044715)

    bf = BQS // NFF
    tiles = []
    for i in range(NFF):
        t = n3[i * bf:(i + 1) * bf]
        hg = _dot(t, w1_ref[...]) + b1_ref[0]
        hidden, gate = hg[:, :FF], hg[:, FF:]
        act = hidden * (0.5 * gate * (
            1.0 + jnp.tanh(c0 * (gate + c1 * gate * gate * gate))))
        y = _dot(act.astype(jnp.bfloat16), w2_ref[...]) + b2_ref[0]
        tiles.append(x[i * bf:(i + 1) * bf] + y)
    o_ref[0] = jnp.concatenate(tiles, axis=0).astype(o_ref.dtype)


def mega_block(x, rk, rv, ck, cv, w):
    """x: (B, S, C) bf16; rk/rv: (B, S, C); ck/cv: (B, SC_PAD, C);
    w: dict of weights (vectors pre-shaped to (1, dim)). Returns bf16."""
    B = x.shape[0]

    def full(shape):
        return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape))

    def row():  # full S row, invariant across the q-tile grid axis
        return pl.BlockSpec((1, S, C), lambda b, i: (b, 0, 0))

    def tile():  # this invocation's BQS query rows
        return pl.BlockSpec((1, BQS, C), lambda b, i: (b, i, 0))

    def ctx():
        return pl.BlockSpec((1, SC_PAD, C), lambda b, i: (b, 0, 0))

    weight_specs = [
        full((C, C)), full((C, C)), full((C, C)), full((C, C)), full((1, C)),
        full((C, C)), full((C, C)), full((1, C)),
        full((C, 2 * FF)), full((1, 2 * FF)), full((FF, C)), full((1, C)),
        full((1, C)), full((1, C)), full((1, C)), full((1, C)),
        full((1, C)), full((1, C)),
    ]
    def w16(name):  # weight MATRICES ship as bf16 (f32 copies cost ~30 MB
        return w[name].astype(jnp.bfloat16)  # of VMEM); vectors stay f32

    return pl.pallas_call(
        _mega_kernel,
        grid=(B, NQS),
        in_specs=[row(), tile(), row(), row(), ctx(), ctx()] + weight_specs,
        out_specs=tile(),
        out_shape=jax.ShapeDtypeStruct((B, S, C), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(x, x, rk, rv, ck, cv,
      w16("wq"), w16("wk"), w16("wv"), w16("wo"), w["bo"],
      w16("wq2"), w16("wo2"), w["bo2"],
      w16("w1"), w["b1"], w16("w2"), w["b2"],
      w["s1"], w["g1"], w["s2"], w["g2"], w["s3"], w["g3"])


def xla_reference(x, rk, rv, ck, cv, w):
    """Same math through plain jnp (mirrors TransformerBlock's read path).
    At S=9216 dense scores are 87 GB, so the reference switches to the
    PRODUCTION attention path — the repo's Pallas flash kernels — which is
    the honest comparator there (what the model actually runs today)."""
    scale = 1.0 / math.sqrt(HD)
    use_flash = S > 4096

    def heads_attn(q, k, v, mask_len=None):
        if use_flash:
            from mikudance_tpu.kernels.flash_attention import (
                flash_attention_cross, flash_attention_fullc)
            if mask_len is not None:
                return flash_attention_cross(
                    q, k[:, :mask_len], v[:, :mask_len], HEADS, scale)
            return flash_attention_fullc(q, k, v, HEADS, scale)
        B, Sq, _ = q.shape
        Sk = k.shape[1]
        qh = q.reshape(B, Sq, HEADS, HD)
        kh = k.reshape(B, Sk, HEADS, HD)
        vh = v.reshape(B, Sk, HEADS, HD)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        if mask_len is not None:
            m = jnp.arange(Sk) < mask_len
            s = jnp.where(m[None, None, None, :], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
        return o.reshape(B, Sq, HEADS * HD)

    xf = x.astype(jnp.float32)
    hn = _ln(xf, w["s1"], w["g1"]).astype(jnp.bfloat16)
    q = hn @ w["wq"].astype(jnp.bfloat16)
    k = hn @ w["wk"].astype(jnp.bfloat16) + rk
    v = hn @ w["wv"].astype(jnp.bfloat16) + rv
    a1 = heads_attn(q, k, v)
    xf = xf + (a1 @ w["wo"].astype(jnp.bfloat16)).astype(jnp.float32) + w["bo"]

    n2 = _ln(xf, w["s2"], w["g2"]).astype(jnp.bfloat16)
    q2 = n2 @ w["wq2"].astype(jnp.bfloat16)
    a2 = heads_attn(q2, ck, cv, mask_len=SC)
    xf = xf + (a2 @ w["wo2"].astype(jnp.bfloat16)).astype(jnp.float32) + w["bo2"]

    n3 = _ln(xf, w["s3"], w["g3"]).astype(jnp.bfloat16)
    hg = (n3 @ w["w1"].astype(jnp.bfloat16)).astype(jnp.float32) + w["b1"]
    hidden, gate = hg[..., :FF], hg[..., FF:]
    act = hidden * (0.5 * gate * (1.0 + jax.lax.erf(gate / np.sqrt(2.0))))
    y = (act.astype(jnp.bfloat16) @ w["w2"].astype(jnp.bfloat16)
         ).astype(jnp.float32) + w["b2"]
    return (xf + y).astype(jnp.bfloat16)


def _selftest_dims():
    """Shrink every dimension and run the kernel in interpret mode on CPU —
    catches shape/indexing bugs without burning chip time."""
    global S, C, HEADS, HD, SC, SC_PAD, FF, BQS
    S, C, HEADS = 192, 128, 8
    HD = C // HEADS
    SC, SC_PAD = 13, 16
    FF = 4 * C
    BQS = S // NQS


def _set_level(name):
    """Switch to another UNet level's geometry (same 768^2 denoise):
    'mid' = S=576, C=1280 (whole-row q tiles fit VMEM); 'big' = S=9216,
    C=320, the top level — 16 q-tiles, so the kv-proj recompute tax is
    ~+38% of block FLOPs there (the two-kernel split's upside)."""
    global S, C, HD, FF, NQS, BQS
    if name == "mid":
        S, C = 576, 1280
        NQS = 1  # (576, 576) scores are small; no q-tiling needed
    else:
        assert name == "big", name
        S, C = 9216, 320
        NQS = 16  # (576, 9216) f32 scores = 20 MB per tile
    HD = C // HEADS
    FF = 4 * C
    BQS = S // NQS


def main():
    selftest = "--selftest" in sys.argv
    if "--mid" in sys.argv:
        _set_level("mid")
    elif "--big" in sys.argv:
        _set_level("big")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else (2 if selftest else 32)
    if selftest:
        jax.config.update("jax_platforms", "cpu")
        _selftest_dims()
        global _INTERPRET
        _INTERPRET = True
    rng = np.random.default_rng(0)

    def randn(*shape, s=0.02):
        return jnp.asarray(rng.normal(0, s, shape).astype(np.float32))

    x = randn(B, S, C, s=1.0).astype(jnp.bfloat16)
    rk = randn(B, S, C, s=0.5).astype(jnp.bfloat16)
    rv = randn(B, S, C, s=0.5).astype(jnp.bfloat16)
    ckf = np.zeros((B, SC_PAD, C), np.float32)
    cvf = np.zeros((B, SC_PAD, C), np.float32)
    ckf[:, :SC] = rng.normal(0, 0.5, (B, SC, C))
    cvf[:, :SC] = rng.normal(0, 0.5, (B, SC, C))
    ck = jnp.asarray(ckf, jnp.bfloat16)
    cv = jnp.asarray(cvf, jnp.bfloat16)
    w = {  # vectors shaped (1, dim): TPU-friendly 2-D VMEM blocks
        "wq": randn(C, C), "wk": randn(C, C), "wv": randn(C, C),
        "wo": randn(C, C), "bo": randn(1, C),
        "wq2": randn(C, C), "wo2": randn(C, C), "bo2": randn(1, C),
        "w1": randn(C, 2 * FF), "b1": randn(1, 2 * FF),
        "w2": randn(FF, C), "b2": randn(1, C),
        "s1": jnp.ones((1, C)), "g1": randn(1, C),
        "s2": jnp.ones((1, C)), "g2": randn(1, C),
        "s3": jnp.ones((1, C)), "g3": randn(1, C),
    }

    from mikudance_tpu.utils.profiling import force

    mega = jax.jit(mega_block)
    ref = jax.jit(xla_reference)

    print("compiling XLA reference...", flush=True)
    r = ref(x, rk, rv, ck, cv, w)
    force(r)
    print("compiling mega kernel...", flush=True)
    m = mega(x, rk, rv, ck, cv, w)
    force(m)

    rf = np.asarray(r, np.float32)
    mf = np.asarray(m, np.float32)
    rel = np.abs(rf - mf).max() / (np.abs(rf).max() + 1e-9)
    print(f"parity: max rel err {rel:.4g}")

    def bench(f, label):
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            force(f(x, rk, rv, ck, cv, w))
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        # FLOPs: qkv+out 4*S*C*C, attn 2*2*S*S*C, cross ~2*2*S*SC*C + 2*S*C*C,
        # FF 2*S*C*2FF + 2*S*FF*C  (x2 for MAC)
        fl = B * 2 * (4 * S * C * C + 2 * S * S * C + 2 * S * SC * C
                      + 2 * S * C * C + S * C * 2 * FF + S * FF * C)
        print(f"{label}: {t * 1e3:.2f} ms  ({fl / t / 1e12:.1f} TF/s)")
        return t

    t_ref = bench(ref, "XLA block")
    t_mega = bench(mega, "MEGA kernel")
    print(f"SPEEDUP: {t_ref / t_mega:.3f}x")


if __name__ == "__main__":
    main()
