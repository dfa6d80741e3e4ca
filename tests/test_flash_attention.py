"""Pallas flash-attention parity vs the dense reference (interpret mode on CPU).

The native-kernel-vs-Python-reference pattern the reference uses for its only
real test (`/root/reference/src/XPose/models/UniPose/ops/test.py`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mikudance_tpu.kernels.flash_attention import _use_flash, flash_attention
from mikudance_tpu.models.layers import dot_product_attention


@pytest.mark.parametrize("hd,heads", [(40, 4), (80, 2), (160, 2)])
def test_flash_matches_dense(hd, heads):
    rng = np.random.default_rng(hd)
    B, S = 2, 512
    C = hd * heads
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32) for _ in range(3)
    )
    want = np.asarray(dot_product_attention(q, k, v, heads))
    got = np.asarray(
        flash_attention(q, k, v, heads, q_block=128, k_block=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    # bf16 kernel vs fp32 dense: check correlation too
    c = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert c > 0.999


def test_flash_extreme_values_stable():
    """Online softmax must survive large logits without overflow."""
    rng = np.random.default_rng(0)
    B, S, heads, hd = 1, 256, 2, 40
    C = heads * hd
    q = jnp.asarray(rng.normal(size=(B, S, C)) * 30, jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, C)) * 30, jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32)
    got = np.asarray(
        flash_attention(q, k, v, heads, q_block=128, k_block=128, interpret=True)
    )
    assert np.isfinite(got).all()


def test_dispatch_rule():
    from mikudance_tpu.kernels.flash_attention import pick_blocks
    # 9216 / 2304 come from the measured TUNED_BLOCKS table
    assert _use_flash(9216, 9216) and pick_blocks(9216) == (512, 1024)
    assert _use_flash(2304, 2304) and pick_blocks(2304) == (384, 768)
    assert _use_flash(4096, 4096) and pick_blocks(4096) == (512, 1024)
    # 576^2 training latents (5184 = 40.5*128) use 16-multiple fallback blocks
    assert _use_flash(5184, 5184) and pick_blocks(5184) == (432, 864)
    assert not _use_flash(576, 576)  # small level -> dense
    assert not _use_flash(144, 144)
    assert not _use_flash(9216, 257)  # cross-attention -> dense


def test_flash_gradient_matches_dense():
    """custom-VJP chunked backward == autodiff through the dense reference."""
    import jax

    rng = np.random.default_rng(7)
    B, S, heads, hd = 1, 256, 2, 40
    C = heads * hd
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32) for _ in range(3)
    )
    g = jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32)

    def f_dense(q, k, v):
        return jnp.vdot(dot_product_attention(q, k, v, heads), g)

    def f_flash(q, k, v):
        return jnp.vdot(
            flash_attention(q, k, v, heads, q_block=128, k_block=128, interpret=True), g
        )

    want = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-2, rtol=3e-2)
        assert np.corrcoef(np.asarray(a).ravel(), np.asarray(b).ravel())[0, 1] > 0.999


def test_streaming_kernel_parity(monkeypatch):
    """Force the K/V-streaming kernel (used when K/V exceed VMEM, e.g. the
    VAE's single-head 512-dim attention) and check parity."""
    import mikudance_tpu.kernels.flash_attention as fa

    monkeypatch.setattr(fa, "RESIDENT_KV_BYTES", 0)
    rng = np.random.default_rng(11)
    B, S, heads, hd = 2, 512, 1, 128
    C = heads * hd
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32) for _ in range(3)
    )
    want = np.asarray(dot_product_attention(q, k, v, heads))
    got = np.asarray(
        fa.flash_attention(q, k, v, heads, q_block=128, k_block=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("B,S,heads,hd", [(96, 16, 4, 40), (70, 32, 8, 40), (130, 7, 2, 16)])
def test_grouped_small_attention_exact(B, S, heads, hd):
    """Block-diagonal grouping is EXACT vs dense attention (incl. padding)."""
    from mikudance_tpu.kernels.small_attention import grouped_small_attention

    rng = np.random.default_rng(S)
    C = heads * hd
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32) for _ in range(3)
    )
    want = np.asarray(dot_product_attention(q, k, v, heads))
    got = np.asarray(grouped_small_attention(q, k, v, heads))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_temporal_fused_kernel_parity():
    """Fused Pallas temporal kernel (interpret) == dense attention."""
    from mikudance_tpu.kernels.temporal_attention import temporal_attention_fused

    rng = np.random.default_rng(21)
    N, T, heads, hd = 50, 16, 4, 40
    C = heads * hd
    q, k, v = (
        jnp.asarray(rng.normal(size=(N, T, C)), jnp.float32) for _ in range(3)
    )
    want = np.asarray(dot_product_attention(q, k, v, heads))
    got = np.asarray(
        temporal_attention_fused(q, k, v, heads, rows_per_tile=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_cross_attention_kernel_parity():
    """Resident-KV cross-attention kernel (interpret) == dense attention,
    including the 257->264 key padding mask; grads flow via the custom VJP."""
    import jax

    from mikudance_tpu.kernels.flash_attention import flash_attention

    rng = np.random.default_rng(23)
    B, S, Skv, heads, hd = 2, 256, 257, 4, 40
    C = heads * hd
    q = jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Skv, C)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Skv, C)), jnp.float32)
    want = np.asarray(dot_product_attention(q, k, v, heads))
    got = np.asarray(
        flash_attention(q, k, v, heads, q_block=128, k_block=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)

    g = jax.grad(
        lambda q: jnp.sum(
            flash_attention(q, k, v, heads, 128, 128, True) ** 2
        )
    )(q)
    assert np.all(np.isfinite(np.asarray(g)))


def test_temporal_btpc_kernel_parity():
    """(B,T,P,C)-native Pallas temporal kernel (interpret) == einsum twin ==
    transpose + dense attention; plus gradient parity of the custom VJP."""
    import jax

    from mikudance_tpu.kernels.temporal_attention import (
        temporal_attention_btpc,
        temporal_attention_xla,
    )

    rng = np.random.default_rng(22)
    B, T, P, heads, hd = 2, 16, 21, 4, 40  # P=21 exercises position padding
    C = heads * hd
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, T, P, C)), jnp.float32) for _ in range(3)
    )
    # oracle: move positions into batch, run plain attention, move back
    def to_ntc(x):
        return x.transpose(0, 2, 1, 3).reshape(B * P, T, C)
    want = np.asarray(
        dot_product_attention(to_ntc(q), to_ntc(k), to_ntc(v), heads)
        .reshape(B, P, T, C).transpose(0, 2, 1, 3)
    )
    got_xla = np.asarray(temporal_attention_xla(q, k, v, heads))
    np.testing.assert_allclose(got_xla, want, atol=1e-5, rtol=1e-5)
    got = np.asarray(
        temporal_attention_btpc(q, k, v, heads, rows_per_tile=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)

    def loss_kernel(q, k, v):
        o = temporal_attention_btpc(q, k, v, heads, 128, True)
        return jnp.sum(o * o)

    def loss_xla(q, k, v):
        o = temporal_attention_xla(q, k, v, heads)
        return jnp.sum(o * o)

    # the kernel's bf16 forward feeds the cotangent (2*o), so grads agree at
    # bf16 scale, not fp32 scale
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)


def test_flash_non128_blocks_parity():
    """16-multiple (non-128) block sizes must stay exact (5184-token path)."""
    rng = np.random.default_rng(31)
    B, S, heads, hd = 1, 480, 2, 40
    C = heads * hd
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32) for _ in range(3)
    )
    want = np.asarray(dot_product_attention(q, k, v, heads))
    got = np.asarray(
        flash_attention(q, k, v, heads, q_block=96, k_block=160, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_neutral_fullc_kernel_equals_transposed():
    """The layout-neutral transposed-PV kernel (standard (B, S, C) boundary,
    in-MXU transposition) must match the HBM-transposed _t kernel to one
    bf16 ulp — same matmuls, same anchor/ones tricks, different operand
    orientation. (Not bit-identical: the QK contraction widths differ, hd+1
    vs hd+8 zero-padded lanes, and the backend may split those differently
    sized reductions at different points — observed one-ulp flips on 0.07%
    of elements depending on which program compiled first.) Also finite on
    extreme inputs."""
    import mikudance_tpu.kernels.flash_attention as fa

    rng = np.random.default_rng(17)
    B, S, heads, hd = 2, 512, 4, 40
    C = heads * hd
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, S, C)), jnp.bfloat16) for _ in range(3)
    )
    nt = np.asarray(fa.flash_attention_fullc_nt(
        q, k, v, heads, scale, q_block=128, k_block=128, interpret=True
    ).astype(jnp.float32))
    t = np.asarray(fa.flash_attention_fullc_t(
        q, k, v, heads, scale, q_block=128, k_block=128, interpret=True
    ).astype(jnp.float32))
    # one bf16 ulp at |t| <= 0.56: 2^-11 relative -> atol 1e-3 floor for the
    # near-zero entries where relative comparison is meaningless
    np.testing.assert_allclose(nt, t, rtol=2 ** -8, atol=1e-3)
    want = np.asarray(dot_product_attention(q, k, v, heads).astype(jnp.float32))
    np.testing.assert_allclose(nt, want, atol=2e-2, rtol=2e-2)
    q30 = (q.astype(jnp.float32) * 30).astype(jnp.bfloat16)
    out30 = fa.flash_attention_fullc_nt(
        q30, k, v, heads, scale, q_block=128, k_block=128, interpret=True)
    assert np.isfinite(np.asarray(out30.astype(jnp.float32))).all()


def test_transposed_fullc_kernel_parity(monkeypatch):
    """The transposed-PV resident kernel (the 9216-token fast path): force
    its dispatch (FULLC_RESIDENT_BYTES=0 so the old resident path cannot
    claim the shape) and check parity incl. the fused -off row / ones lane."""
    import mikudance_tpu.kernels.flash_attention as fa

    monkeypatch.setattr(fa, "FULLC_RESIDENT_BYTES", 0)
    monkeypatch.setattr(fa, "TRANSPOSED_FULLC", True)
    rng = np.random.default_rng(13)
    B, S, heads, hd = 2, 512, 4, 40  # hd % 128 != 0 -> fullc family
    C = heads * hd
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32) for _ in range(3)
    )
    want = np.asarray(dot_product_attention(q, k, v, heads))
    got = np.asarray(
        flash_attention(q, k, v, heads, q_block=128, k_block=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999

    # extreme values: the anchor + two-sided clamp must keep rows finite
    q30 = jnp.asarray(rng.normal(size=(B, S, C)) * 30, jnp.float32)
    k30 = jnp.asarray(rng.normal(size=(B, S, C)) * 30, jnp.float32)
    got30 = np.asarray(
        flash_attention(q30, k30, v, heads, q_block=128, k_block=128, interpret=True)
    )
    assert np.isfinite(got30).all()
