"""DPT-hybrid depth model: converted-weight output parity vs transformers.

The torch oracle is `transformers.DPTForDepthEstimation` configured exactly
like Intel/dpt-hybrid-midas (is_hybrid, BiT backbone, neck_hidden_sizes
[256, 512, 768, 768], reassemble_factors [1, 1, 1, 0.5]) with random-init
weights — the same offline-parity strategy as tests/test_unipose_parity.py:
if the randomly-initialized twins agree through the converter, the released
checkpoint maps identically (shapes are checked by construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mikudance_tpu.core.convert import convert_dpt
from mikudance_tpu.toolbox.dpt import DPTHybridDepth

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def torch_model():
    from transformers import DPTConfig, DPTForDepthEstimation

    torch.manual_seed(0)
    cfg = DPTConfig(
        is_hybrid=True,
        neck_hidden_sizes=[256, 512, 768, 768],
        reassemble_factors=[1, 1, 1, 0.5],
    )
    return DPTForDepthEstimation(cfg).eval()


def test_dpt_hybrid_converted_parity(torch_model):
    params = convert_dpt(torch_model.state_dict())
    model = DPTHybridDepth()

    rng = np.random.default_rng(0)
    img = rng.normal(0.0, 1.0, (1, 384, 384, 3)).astype(np.float32)

    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).predicted_depth.numpy()  # (1, 384, 384)

    got = np.asarray(
        jax.jit(lambda p, x: model.apply({"params": p}, x))(params, jnp.asarray(img))
    )
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 2e-3, (
        np.abs(got - want).max(), scale)


def test_dpt_converted_tree_matches_init(torch_model):
    """Converted tree has exactly the structure the Flax module initializes
    (no silently-unused weights)."""
    params = convert_dpt(torch_model.state_dict())
    init = DPTHybridDepth().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 3), jnp.float32)
    )["params"]
    flat_c = {"/".join(k.key for k in p): v.shape
              for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_i = {"/".join(k.key for k in p): tuple(v.shape)
              for p, v in jax.tree_util.tree_flatten_with_path(init)[0]}
    assert set(flat_c) == set(flat_i)
    for k in flat_i:
        assert tuple(flat_c[k]) == flat_i[k], (k, flat_c[k], flat_i[k])
