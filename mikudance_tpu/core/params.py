"""Parameter-tree utilities (dtype casting, counting)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params(tree, dtype=jnp.bfloat16):
    """Cast all floating leaves (e.g. to bf16 for inference serving)."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def zeros_like_tree(shape_tree):
    """Materialize a zero param tree from a jax.eval_shape result."""
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shape_tree
    )
