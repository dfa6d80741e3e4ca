"""Fused GroupNorm kernel: Pallas (interpret) == XLA ref == torch.GroupNorm."""

import jax
import jax.numpy as jnp
import numpy as np

from mikudance_tpu.kernels.group_norm import fused_group_norm, group_norm_ref


def _torch_gn(x, scale, bias, groups, eps, act):
    import torch

    xt = torch.from_numpy(np.asarray(x, np.float32)).permute(0, 3, 1, 2)
    gn = torch.nn.GroupNorm(groups, x.shape[-1], eps=eps)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(np.asarray(scale)))
        gn.bias.copy_(torch.from_numpy(np.asarray(bias)))
        y = gn(xt)
        if act == "silu":
            y = torch.nn.functional.silu(y)
    return y.permute(0, 2, 3, 1).numpy()


def test_group_norm_matches_torch_and_kernel():
    rng = np.random.default_rng(7)
    N, H, W, C, G = 3, 12, 10, 64, 32
    x = jnp.asarray(rng.normal(1.5, 2.0, (N, H, W, C)), jnp.float32)
    scale = jnp.asarray(rng.normal(1, 0.2, (C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, (C,)), jnp.float32)
    for act in (None, "silu"):
        want = _torch_gn(x, scale, bias, G, 1e-5, act)
        ref = np.asarray(group_norm_ref(x, scale, bias, G, 1e-5, act))
        np.testing.assert_allclose(ref, want, atol=1e-4, rtol=1e-4)
        got = np.asarray(
            fused_group_norm(x, scale, bias, G, 1e-5, act, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_group_norm_kernel_bf16_and_row_blocks():
    """bf16 input, H not fitting one block (budget forces multi-block stats)."""
    rng = np.random.default_rng(8)
    N, H, W, C, G = 2, 24, 96, 320, 32
    x = jnp.asarray(rng.normal(0, 1, (N, H, W, C)), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    ref = np.asarray(
        group_norm_ref(x, scale, bias, G, 1e-6, "silu"), np.float32)
    got = np.asarray(
        fused_group_norm(x, scale, bias, G, 1e-6, "silu", interpret=True),
        np.float32)
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


def test_group_norm_grad_is_exact_ref():
    rng = np.random.default_rng(9)
    N, H, W, C, G = 2, 8, 8, 32, 8
    x = jnp.asarray(rng.normal(0, 1, (N, H, W, C)), jnp.float32)
    scale = jnp.asarray(rng.normal(1, 0.1, (C,)), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(fused_group_norm(x, s, b, G, 1e-5, "silu", True) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(group_norm_ref(x, s, b, G, 1e-5, "silu") ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_fused_group_norm_module_params_match_nn():
    """FusedGroupNorm is a param-tree drop-in for nn.GroupNorm."""
    from flax import linen as nn

    from mikudance_tpu.models.layers import FusedGroupNorm

    x = jnp.ones((1, 4, 4, 32))
    p_new = FusedGroupNorm(8, 1e-5).init(jax.random.PRNGKey(0), x)["params"]
    p_old = nn.GroupNorm(8, epsilon=1e-5).init(jax.random.PRNGKey(0), x)["params"]
    assert {k: v.shape for k, v in p_new.items()} == {
        k: v.shape for k, v in p_old.items()
    }
    y_new = FusedGroupNorm(8, 1e-5).apply({"params": p_new}, x)
    y_old = nn.GroupNorm(8, epsilon=1e-5).apply({"params": p_old}, x)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_old), atol=1e-5)
