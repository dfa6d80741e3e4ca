"""Sequence-parallel training step == unsharded step, numerically.

The stage-2 geometry (bs-1 20-frame 576^2 clips) does not fit one 16 GB
chip, and data parallelism cannot split a single sample — so the train step
also shards each clip's FRAME axis over a ('data', 'frame') mesh
(core/mesh.py::choose_train_mesh): the model forwards run under shard_map,
with the motion modules resharding via all_to_all exactly as in SPMD
inference (models/motion_module.py), and gradients flowing through the
shard_map transpose. This test proves the sharded step is a drop-in: same
loss and same updated trainable parameters as the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mikudance_tpu.core import mesh as mesh_lib
from mikudance_tpu.core.configs import (
    DenoisingUNetConfig,
    GuidanceUNetConfig,
    MotionModuleConfig,
    UNetConfig,
)
from mikudance_tpu.diffusion.ddim import DDIMSchedule
from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet
from mikudance_tpu.train.steps import TrainConfig, init_train_state, make_train_step

pytestmark = pytest.mark.slow  # heavy tier; see pytest.ini

TINY = UNetConfig(block_out_channels=(32, 64, 96, 96), attention_heads=4)


@pytest.fixture(scope="module")
def setup():
    guide = GuidanceUNet(GuidanceUNetConfig(unet=TINY, use_man=True))
    den = DenoisingUNet(
        DenoisingUNetConfig(unet=TINY, motion=MotionModuleConfig(num_attention_heads=4))
    )
    B, T, h, w = 2, 4, 8, 8
    rng = jax.random.PRNGKey(0)
    gp = jax.jit(guide.init)(
        rng, jnp.zeros((1, h, w, 20)), jnp.zeros((1, h, w, 2)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 768)),
    )
    dp = jax.jit(den.init)(
        rng, jnp.zeros((1, 1, h, w, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 5, 768)),
    )
    rngnp = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rngnp.normal(size=(B, T, h, w, 4)), jnp.float32),
        "cond20": jnp.asarray(rngnp.normal(size=(B, T, h, w, 20)), jnp.float32),
        "motion": jnp.asarray(rngnp.normal(size=(B, T, h, w, 2)), jnp.float32),
        "clip_ctx": jnp.asarray(rngnp.normal(size=(B, 5, 768)), jnp.float32),
        "uncond": jnp.asarray([0.0, 1.0], jnp.float32),
    }
    return guide, den, gp, dp, batch


@pytest.mark.parametrize("substrings", [None, ("motion", "man_")])
def test_sp_step_matches_unsharded(setup, substrings):
    guide, den, gp, dp, batch = setup
    cfg = TrainConfig(trainable_substrings=substrings)
    schedule = DDIMSchedule.create(beta_schedule="scaled_linear")
    key = jax.random.PRNGKey(7)

    # reference: single-device step
    state0, tx = init_train_state(cfg, gp, dp)
    step_ref = make_train_step(cfg, schedule, guide, den, tx)
    ref_state, ref_metrics = jax.jit(step_ref)(state0, batch, key)

    # sequence-parallel: (data=2, frame=4) over the 8-device CPU mesh
    mesh = mesh_lib.choose_train_mesh(jax.devices(), batch=2, frames=4)
    assert mesh is not None and dict(mesh.shape) == {"data": 2, "frame": 4}
    state0b, txb = init_train_state(cfg, gp, dp)
    step_sp = make_train_step(cfg, schedule, guide, den, txb, mesh=mesh)
    sp_batch = mesh_lib.shard_train_batch(batch, mesh)
    state0b = mesh_lib.replicate(state0b, mesh)
    sp_state, sp_metrics = jax.jit(step_sp)(state0b, sp_batch, key)

    np.testing.assert_allclose(
        float(sp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_state.params)
    sp_params = jax.device_get(sp_state.params)
    sp_flat = dict(jax.tree_util.tree_leaves_with_path(sp_params))
    # atol = 2*lr: for a weight whose true gradient is ~0, Adam's first-step
    # update is lr * g/(|g| + eps) — cross-device reduction-order noise can
    # flip that g's sign, kicking the weight by up to ~2*lr either way. Every
    # meaningfully-trained weight matches to rtol.
    atol = 2 * TrainConfig().learning_rate
    for path, want in ref_flat:
        got = sp_flat[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


def test_choose_train_mesh_prefers_data_then_frames():
    devs = jax.devices()
    assert len(devs) == 8
    m = mesh_lib.choose_train_mesh(devs, batch=8, frames=20)
    assert dict(m.shape) == {"data": 8, "frame": 1}
    m = mesh_lib.choose_train_mesh(devs, batch=1, frames=20)
    assert dict(m.shape) == {"data": 1, "frame": 5}  # largest df | 20 with df <= 8
    m = mesh_lib.choose_train_mesh(devs, batch=2, frames=20)
    assert dict(m.shape) == {"data": 2, "frame": 4}
    assert mesh_lib.choose_train_mesh(devs[:1], batch=1, frames=7) is None
