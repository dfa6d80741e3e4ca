"""X16: the reference-style XPose config loader.

Oracle: the reference's own shipped config chain
(`config_model/UniPose_SwinT.py` -> `_base_` -> `coco_transformer.py`).
Loading it must reproduce exactly the geometry the TPU rebuild hard-codes
as `UniPose` defaults — proving the defaults ARE the shipped config — and
the loader must support `_base_` inheritance/overrides and reject the
graph-topology variants the rebuild does not implement.
"""

import os
import textwrap

import pytest

from mikudance_tpu.toolbox.unipose import UniPose
from mikudance_tpu.toolbox.xpose_config import (
    build_unipose_from_config,
    load_model_config,
    unipose_kwargs,
)

REF_CFG = "/root/reference/src/XPose/config_model/UniPose_SwinT.py"


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference absent")
def test_reference_config_matches_unipose_defaults():
    cfg = load_model_config(REF_CFG)
    # _base_ inheritance pulled in the coco_transformer keys
    assert cfg["data_aug_max_size"] == 1333
    kw = unipose_kwargs(cfg)
    model = UniPose(**kw)
    default = UniPose()
    for f in ("hidden_dim", "enc_layers", "dec_layers", "heads", "levels",
              "points", "ffn_dim", "num_queries", "num_groups",
              "num_body_points", "swin_embed_dim", "swin_depths", "swin_heads"):
        assert getattr(model, f) == getattr(default, f), f


def _write(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_base_inheritance_and_override(tmp_path):
    _write(tmp_path, "base.py", """
        modelname = 'UniPose'
        hidden_dim = 256
        nheads = 8
        backbone = 'swin_T_224_1k'
        two_stage_type = 'standard'
        decoder_sa_type = 'sa'
        num_body_points = 68
    """)
    child = _write(tmp_path, "child.py", """
        _base_ = ['base.py']
        backbone = 'swin_L_384_22k'
        dec_layers = 4
    """)
    cfg = load_model_config(child)
    assert cfg["hidden_dim"] == 256  # inherited
    assert cfg["backbone"] == "swin_L_384_22k"  # overridden
    kw = unipose_kwargs(cfg)
    assert kw["swin_embed_dim"] == 192 and kw["swin_depths"] == (2, 2, 18, 2)
    assert kw["dec_layers"] == 4
    model = build_unipose_from_config(child)
    assert model.swin_heads == (6, 12, 24, 48)


def test_nested_base_chain(tmp_path):
    _write(tmp_path, "a.py", "x = 1\ny = 1\nmodelname = 'UniPose'\n")
    _write(tmp_path, "b.py", "_base_ = ['a.py']\ny = 2\nz = 2\n")
    cfg = load_model_config(_write(tmp_path, "c.py", "_base_ = ['b.py']\nz = 3\n"))
    assert (cfg["x"], cfg["y"], cfg["z"]) == (1, 2, 3)


@pytest.mark.parametrize(
    "line",
    [
        "two_stage_type = 'no'",
        "decoder_sa_type = 'ca_label'",
        "use_deformable_box_attn = True",
        "binary_query_selection = True",
        "backbone = 'resnet50'",
        "enc_n_points = 4\ndec_n_points = 8",
    ],
)
def test_unsupported_variants_rejected(tmp_path, line):
    path = _write(tmp_path, "bad.py", f"modelname = 'UniPose'\n{line}\n")
    with pytest.raises(ValueError, match="unsupported XPose"):
        unipose_kwargs(load_model_config(path))
