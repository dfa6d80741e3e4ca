"""Pallas 3x3 conv kernel: interpret-mode parity vs XLA conv, grads, module."""

import jax
import jax.numpy as jnp
import numpy as np

from mikudance_tpu.kernels.conv2d import conv3x3_fused, conv3x3_ref


def test_conv3x3_kernel_parity():
    rng = np.random.default_rng(11)
    for N, H, W, Cin, Cout in [(2, 12, 8, 32, 48), (1, 6, 16, 64, 64),
                               (2, 9, 8, 16, 32)]:
        x = jnp.asarray(rng.normal(0, 1, (N, H, W, Cin)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, Cin, Cout)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.1, (Cout,)), jnp.float32)
        want = np.asarray(conv3x3_ref(x, w, b))
        got = np.asarray(conv3x3_fused(x, w, b, True))
        # kernel computes the matmuls in bf16 (same as the bf16 model path)
        np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_conv3x3_kernel_bf16():
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 32, 32)), jnp.float32)
    b = jnp.zeros((32,), jnp.float32)
    want = np.asarray(conv3x3_ref(x, w, b), np.float32)
    got = np.asarray(conv3x3_fused(x, w, b, True), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_conv3x3_grad_matches_ref():
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 16)), jnp.float32)
    b = jnp.zeros((16,), jnp.float32)

    gk = jax.grad(lambda x, w, b: jnp.sum(conv3x3_fused(x, w, b, True) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(lambda x, w, b: jnp.sum(conv3x3_ref(x, w, b) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    # the kernel's bf16 forward feeds the cotangent; grads agree at bf16 scale
    # relative to their own magnitude
    for a, c in zip(gk, gr):
        a, c = np.asarray(a), np.asarray(c)
        scale = max(1.0, float(np.abs(c).max()))
        np.testing.assert_allclose(a / scale, c / scale, atol=2e-2)


def test_fused_conv_module_params_match_nn_conv():
    from flax import linen as nn

    from mikudance_tpu.models.resnet import FusedConv3x3

    x = jnp.ones((1, 8, 8, 16))
    p_new = FusedConv3x3(24).init(jax.random.PRNGKey(0), x)["params"]
    p_old = nn.Conv(24, (3, 3), padding=((1, 1), (1, 1))).init(
        jax.random.PRNGKey(0), x)["params"]
    assert {k: v.shape for k, v in p_new.items()} == {
        k: v.shape for k, v in p_old.items()
    }
    y_new = FusedConv3x3(24).apply({"params": p_old}, x)
    y_old = nn.Conv(24, (3, 3), padding=((1, 1), (1, 1))).apply(
        {"params": p_old}, x)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_old), atol=1e-5)
