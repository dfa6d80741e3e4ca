"""Swin backbone, CLIP text encoder, and UniPose structural tests.

(Numerical parity against the actual reference torch model lives in
tests/test_unipose_parity.py.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from mikudance_tpu.toolbox.clip_text import CLIPTextEncoder
from mikudance_tpu.toolbox.swin import (
    SwinTransformer,
    relative_position_index,
    shift_mask,
)
from mikudance_tpu.toolbox.unipose import (
    UniPose,
    keypoint_group_mask,
    postprocess,
)


def test_relative_position_index():
    idx = relative_position_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25
    assert (idx.T == idx[::-1, ::-1]).all()  # antisymmetric structure


def test_shift_mask_blocks_cross_regions():
    m = shift_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert (m == 0).any() and (m == -100).any()


def test_swin_tiny_shapes():
    swin = SwinTransformer(embed_dim=32, depths=(1, 1, 1, 1), heads=(2, 2, 4, 4))
    x = jnp.zeros((1, 64, 64, 3))
    p = jax.jit(swin.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(swin.apply)(p, x)
    # out_indices (1,2,3): strides 8, 16, 32 with dims 2C, 4C, 8C
    assert outs[0].shape == (1, 8, 8, 64)
    assert outs[1].shape == (1, 4, 4, 128)
    assert outs[2].shape == (1, 2, 2, 256)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_clip_text_shapes():
    enc = CLIPTextEncoder(vocab_size=1000, width=64, layers=2, heads=4)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 999, (3, 8)), jnp.int32)
    p = jax.jit(enc.init)(jax.random.PRNGKey(0), ids)
    out = jax.jit(enc.apply)(p, ids)
    assert out.shape == (3, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_keypoint_group_mask():
    # 2 groups x (1 instance + 3 kpt) slots; last kpt of each group invisible
    kpt_mask = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    m = np.asarray(keypoint_group_mask(kpt_mask, 2))
    assert m.shape == (1, 8, 8)
    assert not m[0, 0, 1]  # same group, both visible -> allowed
    assert m[0, 0, 3]  # same group, visibility differs -> blocked
    assert m[0, 3, 3] == False  # invis with itself (equal flags) -> allowed
    assert m[0, 0, 4]  # cross-group -> blocked
    assert m[0, 3, 7]  # cross-group even with equal flags -> blocked


def test_unipose_forward_shapes():
    """Tiny-but-structurally-complete UniPose: both decoder phases run."""
    model = UniPose(
        hidden_dim=64, enc_layers=1, dec_layers=3, heads=4, points=2,
        ffn_dim=128, num_queries=60, num_groups=4, num_body_points=20,
        text_dim=16, swin_embed_dim=16, swin_depths=(1, 1, 1, 1),
        swin_heads=(2, 2, 4, 4),
    )
    B, N_TXT, K = 1, 3, 20  # K >= 17: the hw/hw_append split is fixed by the reference
    img = jnp.zeros((B, 64, 64, 3))
    obj = jnp.asarray(np.random.default_rng(0).normal(size=(B, N_TXT, 16)), jnp.float32)
    mask = jnp.asarray([[True, True, False]])
    kpt = jnp.asarray(np.random.default_rng(1).normal(size=(B, K, 16)), jnp.float32)
    vis = jnp.ones((B, K))

    p = jax.jit(model.init)(jax.random.PRNGKey(0), img, obj, mask, kpt, vis)
    out = jax.jit(model.apply)(p, img, obj, mask, kpt, vis)
    assert out["pred_logits"].shape == (B, 4, N_TXT)
    assert out["pred_boxes"].shape == (B, 4, 4)
    assert out["pred_keypoints"].shape == (B, 4, 3 * K)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    assert np.isfinite(np.asarray(out["pred_logits"][..., :2])).all()
    assert np.all(np.asarray(out["pred_logits"])[..., 2] == -np.inf)

    res = postprocess(jax.device_get(out), num_keypoints=K, score_threshold=-1.0)
    assert len(res) == 1 and res[0]["keypoints"].shape[1:] == (K, 2)
