"""Pallas fused LayerNorm / streaming linear kernels vs exact XLA twins.

Both kernels are layout/bandwidth infrastructure (see their module docstrings
for the end-to-end measurements); parity is checked in interpret mode against
the flax/XLA reference semantics, including the custom-VJP backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mikudance_tpu.kernels.layer_norm import fused_layer_norm, layer_norm_ref
from mikudance_tpu.kernels.linear import fused_linear, linear_ref


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_layer_norm_matches_flax(rng):
    x = jnp.asarray(rng.normal(0, 1, (4, 64, 320)).astype(np.float32))
    s = jnp.asarray(rng.normal(1, 0.1, (320,)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (320,)).astype(np.float32))
    got = fused_layer_norm(x, s, b, 1e-5, True)
    want = nn.LayerNorm(epsilon=1e-5).apply({"params": {"scale": s, "bias": b}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-5)


def test_layer_norm_bf16_and_4d(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 3, 8, 256)).astype(np.float32)).astype(jnp.bfloat16)
    s = jnp.ones((256,), jnp.float32)
    b = jnp.zeros((256,), jnp.float32)
    got = fused_layer_norm(x, s, b, 1e-5, True)
    want = layer_norm_ref(x, s, b, 1e-5)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1e-2
    )


def test_layer_norm_grad_matches_ref(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 64)).astype(np.float32))
    s = jnp.asarray(rng.normal(1, 0.1, (64,)).astype(np.float32))
    b = jnp.zeros((64,), jnp.float32)
    g1 = jax.grad(lambda x, s: fused_layer_norm(x, s, b, 1e-5, True).sum(), (0, 1))(x, s)
    g2 = jax.grad(lambda x, s: layer_norm_ref(x, s, b, 1e-5).sum(), (0, 1))(x, s)
    for a, w in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w), atol=1e-5)


def test_linear_matches_ref(rng):
    x = jnp.asarray(rng.normal(0, 1, (64, 320)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (320, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (128,)).astype(np.float32))
    got = fused_linear(x, w, b, None, True)
    want = linear_ref(x, w, b)
    np.testing.assert_array_equal(np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_linear_fused_residual(rng):
    x = jnp.asarray(rng.normal(0, 1, (3, 32, 320)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (320, 320)).astype(np.float32))
    b = jnp.zeros((320,), jnp.float32)
    r = jnp.asarray(rng.normal(0, 1, (3, 32, 320)).astype(np.float32)).astype(jnp.bfloat16)
    got = fused_linear(x, w, b, r, True)
    want = linear_ref(x, w, b, r)
    np.testing.assert_array_equal(np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_linear_grad_matches_ref(rng):
    x = jnp.asarray(rng.normal(0, 1, (16, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, (64, 32)).astype(np.float32))
    b = jnp.zeros((32,), jnp.float32)
    r = jnp.asarray(rng.normal(0, 1, (16, 32)).astype(np.float32))
    g1 = jax.grad(lambda x, w, r: fused_linear(x, w, b, r, True).sum(), (0, 1, 2))(x, w, r)
    g2 = jax.grad(lambda x, w, r: linear_ref(x, w, b, r).sum(), (0, 1, 2))(x, w, r)
    for a, want in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want), atol=1e-5)
