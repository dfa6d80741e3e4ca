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


def test_camera_slerp_and_interpolation():
    from mikudance_tpu.toolbox import camera as cam

    q0 = np.array([1.0, 0, 0, 0])
    q1 = np.array([0.0, 1, 0, 0])
    mid = cam.slerp_quat(0.5, q0, q1)
    np.testing.assert_allclose(np.linalg.norm(mid), 1.0, atol=1e-8)
    np.testing.assert_allclose(mid[0], mid[1], atol=1e-8)  # halfway
    # endpoints
    np.testing.assert_allclose(cam.slerp_quat(0.0, q0, q1), q0, atol=1e-8)
    np.testing.assert_allclose(cam.slerp_quat(1.0, q0, q1), q1, atol=1e-8)
    # antipodal correction: q and -q are the same rotation (needs dot<0 to trip)
    qa = np.array([0.8, 0.6, 0.0, 0.0])
    m1 = cam.slerp_quat(0.3, q0, qa)
    m2 = cam.slerp_quat(0.3, q0, -qa)
    np.testing.assert_allclose(np.abs(np.dot(m1, m2)), 1.0, atol=1e-6)


def test_camera_pose_interpolation_endpoints():
    from mikudance_tpu.toolbox import camera as cam

    steps = np.array([0.0, 4.0])
    poses = np.array([
        [0, 0, 0, 0, 0, 0, 1],   # droid layout: tx ty tz qx qy qz qw
        [4, 0, 0, 0, 0, 0, 1],
    ], np.float64)
    interp = cam.interpolate_camera_poses(steps, poses, 5)
    assert interp.shape == (5, 7)
    np.testing.assert_allclose(interp[:, 0], [0, 1, 2, 3, 4], atol=1e-8)

    w2c, c2w = cam.poses_to_matrices(interp)
    assert w2c.shape == (5, 4, 4)
    # identity rotation, translation in first column entries
    np.testing.assert_allclose(w2c[2, :3, :3], np.eye(3), atol=1e-8)
    np.testing.assert_allclose(w2c[2, :3, 3], [2, 0, 0], atol=1e-8)
    np.testing.assert_allclose(w2c[2] @ c2w[2], np.eye(4), atol=1e-8)


def test_quat_rotation_orthonormal():
    from mikudance_tpu.toolbox.camera import quat_to_rotation

    rng = np.random.default_rng(0)
    for _ in range(5):
        q = rng.normal(size=4)
        R = quat_to_rotation(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)


def test_camera_export(tmp_path):
    from mikudance_tpu.toolbox import camera as cam

    steps = np.array([0.0, 3.0])
    poses = np.array([[0, 0, 0, 0, 0, 0, 1], [1, 2, 3, 0, 0, 0, 1]], np.float64)
    w2c_path, c2w_path = cam.export_camera_files(str(tmp_path), "clip", steps, poses, 4)
    w2c = np.load(w2c_path)
    assert w2c.shape == (4, 4, 4)
    assert (tmp_path / "clip" / "cam-clip.obj").exists()
