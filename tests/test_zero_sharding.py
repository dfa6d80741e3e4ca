"""ZeRO-sharded train state == replicated train state, numerically.

Stage 1 trains both UNets (~1.7B params); replicated fp32 params + Adam
moments are ~27 GB/chip — over a 16 GB v5e. `core/mesh.py::zero_shard_state`
shards every leaf over the data axis along its largest divisible dimension
(the jax.sharding equivalent of ZeRO/FSDP, SURVEY §2.6); XLA inserts the
all-gathers/reduce-scatters. This test proves the sharded step is a
numerical drop-in, that per-device state memory actually drops ~8x, and
that the step's outputs stay sharded (donation-compatible).
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

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

# small on purpose: the interesting machinery is the sharding of ~900 leaves,
# not model depth, and the SPMD-partitioned grad graph is expensive to
# compile on the 1-core host
# min channel 32: the motion module's GroupNorm is hard-coded to 32 groups
# (AnimateDiff semantics)
TINY = UNetConfig(block_out_channels=(32, 64), layers_per_block=1, attention_heads=4)
B, T, h, w = 8, 2, 8, 8


def _norm_spec(spec):
    t = tuple(spec)
    while t and t[-1] is None:
        t = t[:-1]
    return t


def _dev0_bytes(tree):
    dev0 = jax.devices()[0]
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        for s in leaf.addressable_shards:
            if s.device == dev0:
                total += s.data.nbytes
    return total


def test_zero_sharded_step_matches_replicated():
    guide = GuidanceUNet(GuidanceUNetConfig(unet=TINY, use_man=True))
    den = DenoisingUNet(
        DenoisingUNetConfig(unet=TINY, motion=MotionModuleConfig(num_attention_heads=4))
    )
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
        "uncond": jnp.asarray([0.0, 1.0] * 4, jnp.float32),
    }
    cfg = TrainConfig(learning_rate=1e-3)  # stage-1 style: everything trains
    schedule = DDIMSchedule.create(beta_schedule="scaled_linear")
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8
    batch = mesh_lib.shard_batch(batch, mesh)
    key = jax.random.PRNGKey(3)

    state_r, tx_r = init_train_state(cfg, gp, dp)
    step_r = jax.jit(make_train_step(cfg, schedule, guide, den, tx_r))
    state_r = mesh_lib.replicate(state_r, mesh)
    rep_bytes = _dev0_bytes(state_r.params)
    ref_state, ref_m = step_r(state_r, batch, key)

    state_z, tx_z = init_train_state(cfg, gp, dp)
    state_z = mesh_lib.zero_shard_state(state_z, mesh)
    # per-device state memory really drops (~8x for the big leaves)
    assert _dev0_bytes(state_z.params) < 0.25 * rep_bytes
    in_specs = [
        _norm_spec(x.sharding.spec)
        for x in jax.tree_util.tree_leaves(state_z.params)
    ]

    step_z = jax.jit(make_train_step(cfg, schedule, guide, den, tx_z), donate_argnums=0)
    z_state, z_m = step_z(state_z, batch, key)

    # the step's outputs keep the ZeRO shardings (no silent re-replication)
    out_specs = [
        _norm_spec(x.sharding.spec)
        for x in jax.tree_util.tree_leaves(z_state.params)
    ]
    n_kept = sum(int(a == b) for a, b in zip(in_specs, out_specs))
    assert n_kept / len(in_specs) > 0.8, f"{n_kept}/{len(in_specs)} shardings kept"
    assert _dev0_bytes(z_state.params) < 0.25 * rep_bytes

    # numerics: drop-in (same bound rationale as tests/test_train_step_sp.py)
    np.testing.assert_allclose(float(z_m["loss"]), float(ref_m["loss"]), rtol=1e-5)
    atol = 2 * 1e-3  # 2 * learning_rate
    ref_flat = jax.tree_util.tree_leaves_with_path(jax.device_get(ref_state.params))
    z_flat = dict(jax.tree_util.tree_leaves_with_path(jax.device_get(z_state.params)))
    for path, want in ref_flat:
        np.testing.assert_allclose(
            np.asarray(z_flat[path]), np.asarray(want), rtol=2e-5, atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


def test_zero_shard_state_single_device_is_replicated():
    mesh = mesh_lib.make_mesh(jax.devices()[:1])
    tree = {"a": jnp.ones((16, 8)), "b": jnp.ones(())}
    placed = mesh_lib.zero_shard_state(tree, mesh)
    for leaf in jax.tree_util.tree_leaves(placed):
        assert leaf.sharding.is_fully_replicated
