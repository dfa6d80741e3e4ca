"""Data-parallel training-step tests on the 8-device virtual mesh."""

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
from mikudance_tpu.train.steps import (
    TrainConfig,
    init_train_state,
    make_train_step,
    trainable_mask,
)

TINY = UNetConfig(block_out_channels=(32, 64, 96, 96), attention_heads=4)
B, T, h, w = 8, 2, 8, 8


def _models():
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
    return guide, gp, den, dp


def _batch(seed):
    rng = np.random.default_rng(seed)
    return {
        "latents": jnp.asarray(rng.normal(size=(B, T, h, w, 4)), jnp.float32),
        "cond20": jnp.asarray(rng.normal(size=(B, T, h, w, 20)), jnp.float32),
        "motion": jnp.asarray(rng.normal(size=(B, T, h, w, 2)), jnp.float32),
        "clip_ctx": jnp.asarray(rng.normal(size=(B, 5, 768)), jnp.float32),
        "uncond": jnp.asarray((rng.uniform(size=(B,)) < 0.25).astype(np.float32)),
    }


def test_trainable_mask_stage2():
    _, gp, _, dp = _models()
    params = {"guide": gp["params"], "den": dp["params"]}
    mask = trainable_mask(params, ("motion", "man_"))
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    on = [p for p, v in flat if v]
    off = [p for p, v in flat if not v]
    assert on and off
    joined_on = ["/".join(str(getattr(k, 'key', k)) for k in p) for p, v in flat if v]
    assert all(("motion" in j) or ("man_" in j) for j in joined_on)


@pytest.mark.slow
@pytest.mark.parametrize("stage", ["stage1", "stage2"])
def test_train_step_dp(stage):
    guide, gp, den, dp = _models()
    cfg = TrainConfig(
        learning_rate=1e-3,
        trainable_substrings=("motion", "man_") if stage == "stage2" else None,
    )
    schedule = DDIMSchedule.create(beta_schedule="scaled_linear")
    state, tx = init_train_state(cfg, gp, dp)
    step = make_train_step(cfg, schedule, guide, den, tx)

    m = mesh_lib.make_mesh()
    assert m.devices.size == 8
    batch = mesh_lib.shard_batch(_batch(0), m)
    state = mesh_lib.replicate(state, m)

    jstep = jax.jit(step)
    state1, metrics = jstep(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    state2, metrics2 = jstep(state1, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics2["loss"]))
    assert int(state2.step) == 2

    # frozen params unchanged in stage 2; trainable params moved
    def changed(a, b):
        return float(jnp.abs(a - b).max()) > 0

    mask = trainable_mask(state.params, cfg.trainable_substrings)
    leaves = zip(
        jax.tree_util.tree_leaves_with_path(state.params),
        jax.tree_util.tree_leaves(state2.params),
        jax.tree_util.tree_leaves(mask),
    )
    n_changed = n_frozen_ok = 0
    for (path, old), new, trainable in leaves:
        if trainable:
            n_changed += int(changed(old, new))
        else:
            assert not changed(old, new), f"frozen param moved: {path}"
            n_frozen_ok += 1
    assert n_changed > 0
    if stage == "stage2":
        assert n_frozen_ok > 0


@pytest.mark.slow
def test_train_loop_cycles_epochs(tmp_path):
    """max_steps beyond one epoch must re-iterate the loader (the reference's
    per-epoch DataLoader loop, `train_stage1.py:470-478`)."""
    from mikudance_tpu.train.runner import train_loop

    guide, gp, den, dp = _models()
    cfg = TrainConfig(learning_rate=1e-3)
    schedule = DDIMSchedule.create(beta_schedule="scaled_linear")

    epochs = {"n": 0}

    class TwoBatchLoader:
        def __iter__(self):
            epochs["n"] += 1
            yield _batch(0)
            yield _batch(1)

    state = train_loop(
        cfg=cfg, schedule=schedule, guide=guide, guide_params=gp,
        den=den, den_params=dp, batches=TwoBatchLoader(),
        prepare_batch=lambda b, r: b, max_steps=5,
        output_dir=str(tmp_path), run_name="cycle-test",
        checkpointing_steps=10**6, log_every=10**6,
    )
    assert int(state.step) == 5
    assert epochs["n"] == 3  # 2 + 2 + 1 batches


def test_lr_schedules_match_diffusers_semantics():
    """diffusers get_scheduler semantics (`train_stage1.py:378-383`):
    'constant' ignores warmup; others warm 0->lr then hold / decay to 0."""
    from mikudance_tpu.train.steps import make_lr_schedule

    base = 1e-4
    c = make_lr_schedule(TrainConfig(learning_rate=base, lr_scheduler="constant",
                                     lr_warmup_steps=100))
    assert c == base  # a scalar: constant regardless of warmup

    cw = make_lr_schedule(TrainConfig(learning_rate=base,
                                      lr_scheduler="constant_with_warmup",
                                      lr_warmup_steps=100))
    assert float(cw(0)) == 0.0
    assert abs(float(cw(50)) - base / 2) < 1e-9
    assert abs(float(cw(100)) - base) < 1e-9
    assert abs(float(cw(10_000)) - base) < 1e-9

    lin = make_lr_schedule(TrainConfig(learning_rate=base, lr_scheduler="linear",
                                       lr_warmup_steps=100, max_train_steps=1100))
    assert float(lin(0)) == 0.0
    assert abs(float(lin(100)) - base) < 1e-9
    assert abs(float(lin(600)) - base / 2) < 1e-9
    assert abs(float(lin(1100))) < 1e-9

    cos = make_lr_schedule(TrainConfig(learning_rate=base, lr_scheduler="cosine",
                                       lr_warmup_steps=0, max_train_steps=1000))
    assert abs(float(cos(0)) - base) < 1e-9
    assert abs(float(cos(1000))) < 1e-9

    import pytest as _pytest
    with _pytest.raises(ValueError):
        make_lr_schedule(TrainConfig(lr_scheduler="polynomial"))


def _small_models():
    """Smallest structural config (grad-graph compiles dominate test time;
    min channel 32 for the motion module's hard-coded 32-group norm)."""
    SMALL = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                       attention_heads=4)
    guide = GuidanceUNet(GuidanceUNetConfig(unet=SMALL, use_man=True))
    den = DenoisingUNet(
        DenoisingUNetConfig(unet=SMALL, motion=MotionModuleConfig(num_attention_heads=4))
    )
    rng0 = jax.random.PRNGKey(0)
    gp = jax.jit(guide.init)(
        rng0, jnp.zeros((1, h, w, 20)), jnp.zeros((1, h, w, 2)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 768)),
    )
    dp = jax.jit(den.init)(
        rng0, jnp.zeros((1, 1, h, w, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 5, 768)),
    )
    return guide, gp, den, dp


@pytest.mark.slow
def test_gradient_accumulation_matches_full_batch():
    """Accelerate semantics (`solver.gradient_accumulation_steps`): k
    micro-steps on B/k-sample micro-batches, grads averaged, == one step on
    the full B-sample batch (exactly, for deterministic Adam)."""
    guide, gp, den, dp = _small_models()
    schedule = DDIMSchedule.create(beta_schedule="scaled_linear")
    full = _batch(0)
    halves = [
        {k: v[:B // 2] for k, v in full.items()},
        {k: v[B // 2:] for k, v in full.items()},
    ]
    key = jax.random.PRNGKey(9)

    # the loss draws noise per (rng, batch shape), so a k=2 run over halves is
    # not bitwise-equal to one full-batch step; the exact contract is:
    # MultiSteps(k=2) over [h1, h2] == one plain-adamw step on mean(g(h1), g(h2))
    import optax

    from mikudance_tpu.train.steps import diffusion_loss, make_optimizer

    cfg_acc = TrainConfig(learning_rate=1e-3, gradient_accumulation_steps=2)
    cfg_one = TrainConfig(learning_rate=1e-3)

    state, tx_acc = init_train_state(cfg_acc, gp, dp)
    step_acc = jax.jit(make_train_step(cfg_acc, schedule, guide, den, tx_acc))
    s = state
    for hb in halves:
        s, m = step_acc(s, hb, key)
    acc_params = jax.device_get(s.params)

    # manual: average the two micro-grads, apply one plain-adamw update
    grads = []
    for hb in halves:
        def loss_fn(p):
            return diffusion_loss(cfg_one, schedule, guide, den, p, hb, key)
        g = jax.jit(lambda p: jax.grad(loss_fn, has_aux=True)(p)[0])(state.params)
        grads.append(g)
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *grads)
    tx = make_optimizer(cfg_one)
    opt = tx.init(state.params)
    updates, _ = jax.jit(tx.update)(gmean, opt, state.params)
    want = jax.device_get(optax.apply_updates(state.params, updates))

    flat_a = dict(jax.tree_util.tree_leaves_with_path(acc_params))
    for path, wanted in jax.tree_util.tree_leaves_with_path(want):
        np.testing.assert_allclose(
            np.asarray(flat_a[path]), np.asarray(wanted), rtol=2e-5, atol=2e-6,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_train_loop_counts_optimizer_steps_with_accumulation(tmp_path):
    """max_steps and the cadences count OPTIMIZER steps (the reference's
    global_step advances only on sync_gradients): with k=2 accumulation,
    max_steps=3 must consume 6 micro-batches."""
    from mikudance_tpu.train.runner import train_loop

    guide, gp, den, dp = _small_models()
    cfg = TrainConfig(learning_rate=1e-3, gradient_accumulation_steps=2)
    schedule = DDIMSchedule.create(beta_schedule="scaled_linear")
    seen = {"n": 0}

    class Loader:
        def __iter__(self):
            for i in range(10):
                seen["n"] += 1
                yield _batch(i)

    state = train_loop(
        cfg=cfg, schedule=schedule, guide=guide, guide_params=gp,
        den=den, den_params=dp, batches=Loader(), prepare_batch=lambda b, r: b,
        max_steps=3, output_dir=str(tmp_path), run_name="accum-count",
        checkpointing_steps=10**6, log_every=10**6,
    )
    assert seen["n"] == 6  # 3 optimizer steps x 2 micro-batches
    assert int(state.step) == 6  # TrainState.step counts micro-steps


def test_train_loop_smoke_fast(tmp_path):
    """Fast-tier guard: one real train_loop step through the checkpoint
    manager (create, save, wait). Kept OUT of the slow tier so regressions
    in runner.py scaffolding (e.g. an undefined `mgr`) fail in `-m "not
    slow"` runs."""
    import os

    from mikudance_tpu.train.runner import train_loop

    guide, gp, den, dp = _small_models()
    cfg = TrainConfig(learning_rate=1e-3)
    schedule = DDIMSchedule.create(beta_schedule="scaled_linear")

    class OneBatchLoader:
        def __iter__(self):
            yield _batch(0)

    state = train_loop(
        cfg=cfg, schedule=schedule, guide=guide, guide_params=gp,
        den=den, den_params=dp, batches=OneBatchLoader(),
        prepare_batch=lambda b, r: b, max_steps=1,
        output_dir=str(tmp_path), run_name="smoke",
        checkpointing_steps=1, log_every=10**6,
    )
    assert int(state.step) == 1
    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoints"))


@pytest.mark.slow
def test_train_loop_epoch_export(tmp_path):
    """save_model_epochs exports deployables at epoch boundaries (the
    reference's save_model_epoch_interval, `train_stage1.py:736-760`)."""
    from mikudance_tpu.train.runner import train_loop

    guide, gp, den, dp = _small_models()
    cfg = TrainConfig(learning_rate=1e-3)
    schedule = DDIMSchedule.create(beta_schedule="scaled_linear")
    exports = []

    class TwoBatchLoader:
        def __iter__(self):
            yield _batch(0)
            yield _batch(1)

    train_loop(
        cfg=cfg, schedule=schedule, guide=guide, guide_params=gp,
        den=den, den_params=dp, batches=TwoBatchLoader(),
        prepare_batch=lambda b, r: b, max_steps=5,
        output_dir=str(tmp_path), run_name="epoch-export",
        checkpointing_steps=10**6, log_every=10**6, save_model_steps=10**6,
        export_fn=lambda s, st: exports.append(s), save_model_epochs=1,
    )
    # epochs end at steps 2 and 4; the budget cuts epoch 3 at step 5
    assert exports == [2, 4, 5]
