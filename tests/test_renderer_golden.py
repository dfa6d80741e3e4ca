"""Golden-image parity: our cv2 skeleton renderers vs the reference's
matplotlib renderers (`/root/reference/src/XPose/inference_xpose_on_video.py:
48-423` anime pose/face/hand, `:405-755` real-human variants), executed
directly as the oracle on fixed keypoints.

The colormap/linewidth contract is part of the model's conditioning interface
(`README.md:173`), so this is checked perceptually: both renderings are
area-downsampled 16x and compared in RGB; exact rasterization (AA, caps)
legitimately differs between matplotlib and cv2.
"""

import importlib
import sys
import types

import cv2
import numpy as np
import pytest
import torch

from mikudance_tpu.toolbox import skeleton_render as sr
from tests.test_unipose_parity import XPOSE, _install_stubs


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    # transforms.py imports torchvision.transforms(.functional)
    tv = sys.modules["torchvision"]
    tvt = types.ModuleType("torchvision.transforms")
    tvtf = types.ModuleType("torchvision.transforms.functional")
    for n in ("resize", "to_tensor", "normalize", "hflip", "crop"):
        setattr(tvtf, n, lambda *a, **k: a[0])
    tvt.functional = tvtf
    tvt.Compose = lambda fns: (lambda *a: a)
    tv.transforms = tvt
    sys.modules.setdefault("torchvision.transforms", tvt)
    sys.modules.setdefault("torchvision.transforms.functional", tvtf)

    # util.config (imported by the driver) needs addict + yapf
    if "addict" not in sys.modules:
        addict = types.ModuleType("addict")

        class ADict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        addict.Dict = ADict
        yapf = types.ModuleType("yapf")
        yapflib = types.ModuleType("yapf.yapflib")
        yapf_api = types.ModuleType("yapf.yapflib.yapf_api")
        yapf_api.FormatCode = lambda s, **k: (s, True)
        yapflib.yapf_api = yapf_api
        yapf.yapflib = yapflib
        sys.modules.update({"addict": addict, "yapf": yapf,
                            "yapf.yapflib": yapflib,
                            "yapf.yapflib.yapf_api": yapf_api})

    import matplotlib

    matplotlib.use("Agg")
    if XPOSE not in sys.path:
        sys.path.insert(0, XPOSE)
    mod = importlib.import_module("inference_xpose_on_video")

    # the reference's `np.array(skeleton) != []` truthiness idiom relies on
    # numpy<2 semantics; give the module a numpy proxy whose arrays keep it
    class _Arr(np.ndarray):
        def __ne__(self, other):
            if isinstance(other, list) and other == []:
                return self.size > 0
            return super().__ne__(other)

    class _NP:
        def __getattr__(self, k):
            return getattr(np, k)

        @staticmethod
        def array(*a, **k):
            return np.array(*a, **k).view(_Arr)

    mod.np = _NP()
    return mod


def perceptual_diff(a_rgb: np.ndarray, b_rgb: np.ndarray) -> float:
    """Mean abs diff of 16x area-downsampled images (0..255 scale)."""
    small = (48, 48)
    a = cv2.resize(a_rgb.astype(np.float32), small, interpolation=cv2.INTER_AREA)
    b = cv2.resize(b_rgb.astype(np.float32), small, interpolation=cv2.INTER_AREA)
    return float(np.abs(a - b).mean())


def _tgt(kpts: np.ndarray, W: int, H: int):
    flat = torch.as_tensor(kpts.reshape(kpts.shape[0], -1), dtype=torch.float32)
    return {"keypoints": flat, "size": (W, H)}


W = H = 768
RNG = np.random.default_rng(11)
POSE_K = RNG.uniform(0.25, 0.75, (1, 17, 2))
FACE_K = RNG.uniform(0.35, 0.65, (1, 68, 2))
HAND_K = RNG.uniform(0.4, 0.6, (1, 21, 2))


def _golden(ref, fn_name, kpts, vocab_key):
    from PIL import Image

    vocab = getattr(ref, vocab_key)
    img = Image.new("RGB", (W, H), (0, 0, 0))
    out_bgr = getattr(ref, fn_name)(
        img, _tgt(kpts, W, H), vocab["skeleton"], vocab["keypoints"])
    return cv2.cvtColor(out_bgr, cv2.COLOR_BGR2RGB)


def test_pose_renderer_matches_reference(ref):
    want = _golden(ref, "get_pose_image", POSE_K, "person")
    got = sr.render_pose(POSE_K, W, H)
    d = perceptual_diff(got, want)
    assert d < 10.0, f"anime pose renderer diff {d:.2f}"
    assert want.sum() > 0 and got.sum() > 0


def test_face_renderer_matches_reference(ref):
    want = _golden(ref, "get_face_image", FACE_K, "face")
    got = sr.render_face(FACE_K, W, H)
    d = perceptual_diff(got, want)
    assert d < 10.0, f"anime face renderer diff {d:.2f}"


def test_hand_renderer_matches_reference(ref):
    want = _golden(ref, "get_hand_image", HAND_K, "hand")
    got = sr.render_hand(HAND_K, W, H)
    d = perceptual_diff(got, want)
    assert d < 10.0, f"anime hand renderer diff {d:.2f}"


def test_human_pose_renderer_matches_reference(ref):
    want = _golden(ref, "get_human_pose_image", POSE_K, "person")
    got = sr.render_human_pose(POSE_K, W, H)
    d = perceptual_diff(got, want)
    assert d < 10.0, f"human pose renderer diff {d:.2f}"


def test_human_face_renderer_matches_reference(ref):
    want = _golden(ref, "get_human_face_image", FACE_K, "face")
    got = sr.render_human_face(FACE_K, W, H)
    d = perceptual_diff(got, want)
    assert d < 10.0, f"human face renderer diff {d:.2f}"


def test_human_face_multi_person_bails_out(ref):
    two = np.concatenate([FACE_K, FACE_K * 0.9], axis=0)
    got = sr.render_human_face(two, W, H)
    assert got.sum() == 0  # reference returns the untouched canvas
