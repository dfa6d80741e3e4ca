"""Full keypoint-vocabulary parity against the reference catalog.

The category names, keypoint name lists (the CLIP text prompts), and skeleton
edge lists are the open-vocabulary detection contract
(`/root/reference/src/XPose/predefined_keypoints.py:1-1002`); this test
imports the reference file as the oracle and proves the in-repo catalog
(`mikudance_tpu/toolbox/vocabularies.py`) is identical, and that the driver
vocabulary resolution follows the reference's rule
(`inference_xpose_on_image.py:611-624`).
"""

import importlib.util

import numpy as np
import pytest

from mikudance_tpu.toolbox import keypoints as kp
from mikudance_tpu.toolbox.vocabularies import VOCAB, resolve_vocabulary

REF = "/root/reference/src/XPose/predefined_keypoints.py"


def _load_reference_catalog():
    spec = importlib.util.spec_from_file_location("ref_predefined_keypoints", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return {
        k: v
        for k, v in vars(mod).items()
        if isinstance(v, dict) and "keypoints" in v
    }


def test_catalog_matches_reference_exactly():
    ref = _load_reference_catalog()
    assert set(VOCAB) == set(ref), "category set differs"
    for name, d in ref.items():
        assert VOCAB[name]["keypoints"] == d["keypoints"], name
        got = [list(e) for e in VOCAB[name]["skeleton"]]
        want = [list(e) for e in d.get("skeleton", [])]
        assert got == want, name


def test_catalog_has_all_28_categories():
    assert len(VOCAB) == 28


def test_trio_constants_agree_with_catalog():
    # toolbox.keypoints' render-contract constants are views of the catalog
    assert kp.PERSON_KEYPOINTS == VOCAB["person"]["keypoints"]
    assert kp.FACE_KEYPOINTS == VOCAB["face"]["keypoints"]
    assert kp.HAND_KEYPOINTS == VOCAB["hand"]["keypoints"]
    assert [list(e) for e in kp.PERSON_SKELETON] == [
        list(e) for e in VOCAB["person"]["skeleton"]
    ]


def test_resolution_rule():
    # instance name wins when known
    names, skel = resolve_vocabulary("car")
    assert names == VOCAB["car"]["keypoints"]
    # free text falls back to the animal vocabulary (reference :621-624)
    names, _ = resolve_vocabulary("dragon")
    assert names == VOCAB["animal"]["keypoints"]
    # explicit keypoint example overrides both (reference :611-615)
    names, _ = resolve_vocabulary("dragon", keypoint_example="animal_face")
    assert names == VOCAB["animal_face"]["keypoints"]


@pytest.mark.parametrize("cat", ["animal", "car", "skirt", "table"])
def test_generic_renderer_accepts_every_category(cat):
    from mikudance_tpu.toolbox import skeleton_render as sr

    names, skel = resolve_vocabulary(cat)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.2, 0.8, size=(len(names), 2))
    img = sr.render_generic(pts, 128, 96, skel)
    assert img.shape == (96, 128, 3) and img.dtype == np.uint8
    assert img.max() > 0  # something was drawn


def test_driver_vocab_and_renderer_dispatch():
    from tools.inference_xpose_on_video import vocab_and_renderer

    # contract renderers for the trio
    names, render = vocab_and_renderer("person")
    assert len(names) == 17
    # generic for everything else, including free text
    names, render = vocab_and_renderer("locust")
    assert len(names) == 35
    img = render(np.full((len(names), 2), 0.5), 64, 64)
    assert img.shape == (64, 64, 3)
