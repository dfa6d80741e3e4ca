"""CLIP vision tower: converted-weight output parity vs transformers.

The torch oracle is `transformers.CLIPVisionModelWithProjection` — the exact
class the reference loads as its image encoder
(`/root/reference/scripts/inference_video.py:97-99`) — at a tiny random-init
config. The reference's image prompt is the FULL projected token sequence
(`/root/reference/src/pipelines/pipeline_mikudance.py:405-417`:
last_hidden_state -> post_layernorm -> visual_projection), so that is the
tensor compared. If the random-init twins agree through `convert_clip_vision`,
the released sd-image-variations checkpoint maps identically (the state-dict
key schema is the same; only shapes differ, and those are checked by
construction).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mikudance_tpu.core.configs import CLIPVisionConfig
from mikudance_tpu.core.convert import convert_clip_vision
from mikudance_tpu.models.clip_vision import CLIPVisionTower

transformers = pytest.importorskip("transformers")

TINY = dict(
    image_size=28,
    patch_size=7,
    hidden_size=64,
    intermediate_size=128,
    num_layers=3,
    num_heads=4,
    projection_dim=48,
)


@pytest.fixture(scope="module")
def torch_model():
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    torch.manual_seed(0)
    cfg = HFConfig(
        image_size=TINY["image_size"],
        patch_size=TINY["patch_size"],
        hidden_size=TINY["hidden_size"],
        intermediate_size=TINY["intermediate_size"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        projection_dim=TINY["projection_dim"],
    )
    return CLIPVisionModelWithProjection(cfg).eval()


def test_clip_vision_converted_parity(torch_model):
    cfg = CLIPVisionConfig(**TINY)
    tower = CLIPVisionTower(cfg)

    src = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = {"params": convert_clip_vision(src, num_layers=cfg.num_layers)}

    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)

    with torch.no_grad():
        # the reference projects the full token sequence, not the pooled one:
        # visual_projection(post_layernorm(last_hidden_state))
        out = torch_model.vision_model(torch.from_numpy(img).permute(0, 3, 1, 2))
        tokens = torch_model.vision_model.post_layernorm(out.last_hidden_state)
        want = torch_model.visual_projection(tokens).numpy()
        # and the pooled path must be a slice of the same computation
        pooled = torch_model(torch.from_numpy(img).permute(0, 3, 1, 2)).image_embeds

    got = np.asarray(tower.apply(params, jnp.asarray(img)))
    assert got.shape == want.shape == (2, (cfg.image_size // cfg.patch_size) ** 2 + 1,
                                       cfg.projection_dim)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(got[:, 0], pooled.numpy(), atol=2e-5, rtol=1e-4)


def test_clip_preprocess_constants_match_transformers():
    """CLIPImageProcessor's normalization constants are the conditioning
    contract for the image prompt (`anime_image_dataset.py:142-144`)."""
    from transformers import CLIPImageProcessor

    from mikudance_tpu.models.clip_vision import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    proc = CLIPImageProcessor()
    np.testing.assert_allclose(CLIP_IMAGE_MEAN, proc.image_mean)
    np.testing.assert_allclose(CLIP_IMAGE_STD, proc.image_std)
