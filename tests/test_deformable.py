"""Multi-scale deformable attention: jnp vs torch-grid_sample oracle vs C++.

The kernel-vs-reference pattern of the reference's only real test
(`src/XPose/models/UniPose/ops/test.py`): forward equivalence across
implementations plus a gradient check on the jnp path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mikudance_tpu.toolbox.deformable import ms_deform_attn

SHAPES = [(8, 8), (4, 4), (2, 2)]
B, Hh, D, Q, P = 2, 4, 16, 10, 4
S = sum(h * w for h, w in SHAPES)


def _inputs(seed):
    rng = np.random.default_rng(seed)
    value = rng.normal(size=(B, S, Hh, D)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, size=(B, Q, Hh, len(SHAPES), P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Q, Hh, len(SHAPES), P)).astype(np.float32)
    w = w / w.sum(axis=(-2, -1), keepdims=True)
    return value, locs, w


def _torch_oracle(value, locs, w):
    """grid_sample-based spec (independent reimplementation of the math in
    the reference's pure-PyTorch function, `ops/functions/ms_deform_attn_func.py:41`)."""
    import torch
    import torch.nn.functional as F

    value_t = torch.from_numpy(value)
    out = torch.zeros(B, Hh, Q, D)
    offset = 0
    for l, (h, wdt) in enumerate(SHAPES):
        v = value_t[:, offset : offset + h * wdt]  # (B, hw, Hh, D)
        v = v.permute(0, 2, 3, 1).reshape(B * Hh, D, h, wdt)
        g = torch.from_numpy(locs[:, :, :, l])  # (B, Q, Hh, P, 2)
        g = g.permute(0, 2, 1, 3, 4).reshape(B * Hh, Q, P, 2)
        g = 2 * g - 1
        sampled = F.grid_sample(
            v, g, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (B*Hh, D, Q, P)
        wt = torch.from_numpy(w[:, :, :, l]).permute(0, 2, 1, 3)  # (B, Hh, Q, P)
        wt = wt.reshape(B * Hh, 1, Q, P)
        out += (sampled * wt).sum(-1).reshape(B, Hh, D, Q).permute(0, 1, 3, 2)
        offset += h * wdt
    return out.permute(0, 2, 1, 3).reshape(B, Q, Hh * D).numpy()


def test_jnp_matches_torch_oracle():
    value, locs, w = _inputs(0)
    want = _torch_oracle(value, locs, w)
    got = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_cpp_matches_jnp():
    from mikudance_tpu.toolbox.native import ms_deform_attn_cpu

    value, locs, w = _inputs(1)
    want = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)))
    got = ms_deform_attn_cpu(value, SHAPES, locs, w)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_gradcheck_vs_torch():
    """Gradients of the jnp path match torch autograd through the oracle
    (the reference gradchecks its CUDA kernel, ops/test.py:63-85)."""
    import torch
    import torch.nn.functional as F

    value, locs, w = _inputs(2)
    g_out = np.random.default_rng(3).normal(size=(B, Q, Hh * D)).astype(np.float32)

    def f_jax(v):
        out = ms_deform_attn(v, SHAPES, jnp.asarray(locs), jnp.asarray(w))
        return jnp.vdot(out, jnp.asarray(g_out))

    got = np.asarray(jax.grad(f_jax)(jnp.asarray(value)))

    vt = torch.from_numpy(value).requires_grad_(True)
    out = torch.zeros(B, Hh, Q, D)
    offset = 0
    for l, (h, wdt) in enumerate(SHAPES):
        v = vt[:, offset : offset + h * wdt].permute(0, 2, 3, 1).reshape(B * Hh, D, h, wdt)
        g = torch.from_numpy(locs[:, :, :, l]).permute(0, 2, 1, 3, 4).reshape(B * Hh, Q, P, 2)
        sampled = F.grid_sample(v, 2 * g - 1, mode="bilinear", padding_mode="zeros",
                                align_corners=False)
        wt = torch.from_numpy(w[:, :, :, l]).permute(0, 2, 1, 3).reshape(B * Hh, 1, Q, P)
        out = out + (sampled * wt).sum(-1).reshape(B, Hh, D, Q).permute(0, 1, 3, 2)
        offset += h * wdt
    loss = (out.permute(0, 2, 1, 3).reshape(B, Q, Hh * D) * torch.from_numpy(g_out)).sum()
    loss.backward()
    np.testing.assert_allclose(got, vt.grad.numpy(), atol=1e-4, rtol=1e-3)


def test_query_chunked_equals_dense():
    """The streamed (q_chunk) evaluation must be numerically identical to the
    one-shot dense path — chunking exists purely to bound the gather
    working set (the UniPose encoder's Q=13294 OOMs a 16 GB chip unchunked)."""
    value, locs, w = _inputs(7)
    dense = np.asarray(
        ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(locs),
                       jnp.asarray(w), q_chunk=Q)
    )
    chunked = np.asarray(
        ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(locs),
                       jnp.asarray(w), q_chunk=max(1, Q // 3))
    )
    np.testing.assert_allclose(chunked, dense, atol=1e-6, rtol=1e-6)
