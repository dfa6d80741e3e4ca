"""Swin backbone, CLIP text encoder, and UniPose structural tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mikudance_tpu.toolbox.clip_text import CLIPTextEncoder
from mikudance_tpu.toolbox.swin import SwinTransformer, relative_position_index, shift_mask
from mikudance_tpu.toolbox.unipose import UniPose, keypoint_group_mask, postprocess


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
    m = keypoint_group_mask(3, 4)
    assert m.shape == (12, 12)
    assert not m[0, 3] and m[0, 4]  # within group ok, across blocked
    assert not m.diagonal().any()


def test_unipose_forward_shapes():
    model = UniPose(
        hidden_dim=32, enc_layers=1, dec_layers=2, heads=4, points=2,
        num_groups=3, num_body_points=5, text_dim=16,
    )
    # swin default is full Swin-T; shrink by overriding backbone via a tiny
    # image (64x64 -> levels 8,4,2 + extra 1)
    img = jnp.zeros((1, 64, 64, 3))
    inst = jnp.zeros((1, 2, 16))
    kpt = jnp.zeros((1, 5, 16))
    p = jax.jit(model.init)(jax.random.PRNGKey(0), img, inst, kpt)
    outs = jax.jit(model.apply)(p, img, inst, kpt)
    assert len(outs) == 2
    last = outs[-1]
    assert last["logits"].shape == (1, 3, 2)
    assert last["boxes"].shape == (1, 3, 4)
    assert last["keypoints"].shape == (1, 3, 5, 2)
    res = postprocess(jax.device_get(outs), score_threshold=-1.0)
    assert len(res) == 1 and res[0]["keypoints"].shape[1:] == (5, 2)
