"""pjit/SPMD training steps for the two MikuDance stages.

Rebuilds the reference trainers' step semantics
(`/root/reference/scripts/train_stage1.py:478-667`,
`train_stage2.py:560-760`) as pure jitted functions over a 1-D ``data`` mesh:

- batch sharded over the mesh, params/optimizer replicated; the DDP gradient
  all-reduce of Accelerate (`train_stage1.py:659`) is the psum XLA inserts
  from the sharding annotations — no NCCL analog code.
- condition dropout by scaling: an uncond step zeroes the CLIP embeds and
  skips the reference UNet (`train_stage1.py:505,529-532`; Net.forward
  `:67-91`); functionally, "skip the reference UNet" == "banks are zero", so
  the graph stays static and the guidance UNet simply receives zero gradient.
- stage 1 trains both UNets (no motion modules); stage 2 freezes everything
  except motion modules + MAN blocks (`train_stage2.py:379-394`), expressed
  as an optax mask over param-path labels.
- v-prediction targets with zero-terminal-SNR schedule + min-SNR-gamma
  weighting + noise offset (`train_stage1.py:489-652`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

try:  # moved between jax versions
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core import mesh as mesh_lib
from ..diffusion.ddim import DDIMSchedule, min_snr_loss_weight
from ..models.unet import DenoisingUNet, GuidanceUNet
from ..pipelines.video import SD_LATENT_SCALE


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 1e-2
    max_grad_norm: float = 1.0
    uncond_ratio: float = 0.1
    noise_offset: float = 0.05
    snr_gamma: float = 5.0
    prediction_type: str = "v_prediction"
    # stage 2 trains only these param-path substrings; stage 1 trains all.
    trainable_substrings: Optional[Tuple[str, ...]] = None  # e.g. ("motion", "man_")
    # LR schedule, diffusers get_scheduler semantics (`train_stage1.py:378-383`;
    # shipped configs use 'constant', configs/train/*.yaml:18-19)
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 0
    max_train_steps: int = 0  # decay horizon for 'linear' / 'cosine'
    # micro-batch gradient accumulation (`solver.gradient_accumulation_steps`,
    # Accelerate semantics: grads averaged over k micro-steps, one optimizer
    # step per k). Shipped configs use 1.
    gradient_accumulation_steps: int = 1


def trainable_mask(params, substrings: Optional[Tuple[str, ...]]):
    """Pytree of bools: True where the param path contains any substring."""
    if substrings is None:
        return jax.tree_util.tree_map(lambda _: True, params)

    def mask_path(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(k) for k in keys)
        return any(s in joined for s in substrings)

    return jax.tree_util.tree_map_with_path(mask_path, params)


def make_lr_schedule(cfg: TrainConfig):
    """LR schedule with diffusers ``get_scheduler`` semantics
    (`/root/reference/scripts/train_stage1.py:378-383`): 'constant' ignores
    warmup entirely; the others warm up linearly from 0 over
    ``lr_warmup_steps`` then hold / decay to 0 at ``max_train_steps``."""
    base, warm = cfg.learning_rate, cfg.lr_warmup_steps
    total = max(cfg.max_train_steps, warm + 1)
    kind = cfg.lr_scheduler
    if kind == "constant":
        return base
    if kind == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, max(warm, 1)),
             optax.constant_schedule(base)],
            [warm],
        )
    if kind == "linear":
        decay = optax.linear_schedule(base, 0.0, max(total - warm, 1))
    elif kind == "cosine":
        decay = optax.cosine_decay_schedule(base, max(total - warm, 1))
    else:
        raise ValueError(f"unsupported lr_scheduler {kind!r}")
    if warm == 0:
        return decay
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base, warm), decay], [warm]
    )


def make_optimizer(cfg: TrainConfig, params=None):
    """Optimizer over the TRAINABLE partition only. Freezing is expressed by
    never showing frozen params to the optimizer (make_train_step partitions
    the tree), not by an optax mask: a multi_transform over the full tree made
    the update pass touch every frozen SD weight (zero-grad materialization +
    add-zero apply), which alone pushed the stage-2 step past a 16 GB chip."""
    del params  # kept for signature stability
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            make_lr_schedule(cfg),
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        ),
    )
    if cfg.gradient_accumulation_steps > 1:
        # grads average over k micro-steps, the inner chain (incl. the global
        # -norm clip, applied to the SYNCED average as Accelerate does) fires
        # every k-th — one TrainState.step is one micro-step
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.gradient_accumulation_steps)
    return tx


@dataclasses.dataclass
class TrainState:
    params: Dict[str, Any]  # {"guide": ..., "den": ...}
    opt_state: Any
    step: jnp.ndarray


def init_train_state(
    cfg: TrainConfig, guide_params, den_params, frozen_dtype=None
) -> Tuple[TrainState, Any]:
    """frozen_dtype: storage dtype for non-trainable params (their optimizer
    branch is set_to_zero, so e.g. bf16 storage is lossless for training and
    halves the HBM held by the ~1.7B frozen SD weights — stage-2 at 576^2/20f
    does not fit a 16 GB chip with everything in fp32)."""
    params = {"guide": guide_params["params"], "den": den_params["params"]}
    mask = trainable_mask(params, cfg.trainable_substrings)
    if frozen_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda p, m: p if m else p.astype(frozen_dtype), params, mask
        )
    tx = make_optimizer(cfg)
    train_p, _ = _partition(params, mask)
    return TrainState(params, tx.init(train_p), jnp.zeros((), jnp.int32)), tx


def _models_forward(
    guide: GuidanceUNet,
    den: DenoisingUNet,
    params: Dict[str, Any],
    noisy: jnp.ndarray,  # (B, T, h, w, 4)
    t: jnp.ndarray,  # (B,)
    ctx: jnp.ndarray,  # (B, S, 768)
    cond20: jnp.ndarray,  # (B, T, h, w, 20)
    motion: jnp.ndarray,  # (B, T, h, w, 2)
    uncond: jnp.ndarray,  # (B,)
) -> jnp.ndarray:
    """Guidance banks + denoising prediction. Pure in (B, T) — safe to run
    per shard under shard_map with B and T both sharded (the guidance UNet is
    strictly per-frame; the denoising UNet's only cross-frame ops are the
    motion modules, which reshard internally when frame_axis is set)."""
    B, T = noisy.shape[:2]
    cdtype = den.dtype
    cond_f = cond20.reshape((B * T,) + cond20.shape[2:])
    motion_f = motion.reshape((B * T,) + motion.shape[2:])
    ctx_f = jnp.repeat(ctx, T, axis=0)
    banks = guide.apply(
        {"params": params["guide"]},
        cond_f.astype(cdtype),
        motion_f.astype(cdtype),
        jnp.zeros((B * T,), jnp.int32),
        ctx_f.astype(cdtype),
    )
    # uncond samples skip the reference forward == zero banks (Net.forward :67-91)
    keep = jnp.repeat(1.0 - uncond, T, axis=0)[:, None, None].astype(cdtype)
    banks = {k: v * keep for k, v in banks.items()}
    return den.apply(
        {"params": params["den"]},
        noisy.astype(cdtype),
        t,
        ctx.astype(cdtype),
        banks,
    ).astype(jnp.float32)


def diffusion_loss(
    cfg: TrainConfig,
    schedule: DDIMSchedule,
    guide: GuidanceUNet,
    den: DenoisingUNet,
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    mesh=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One loss evaluation.

    batch:
      latents      (B, T, h, w, 4)  clean target latents (pre-scaled)
      cond20       (B, T, h, w, 20) guidance stack
      motion       (B, T, h, w, 2)  scene-motion map (zeros for stage 1)
      clip_ctx     (B, S, 768)      CLIP image tokens
      uncond       (B,)             1.0 where this sample drops conditioning

    With a ('data', 'frame') ``mesh``, the model forwards run under
    ``shard_map`` with batch AND frames sharded (sequence parallelism): one
    576^2 20-frame stage-2 sample does not fit a 16 GB chip, and data
    parallelism cannot split a single sample. The noise/target algebra and
    the loss reduction stay outside as plain sharded jnp (elementwise /
    reductions XLA partitions for free); results are numerically identical
    to the unsharded step (tests/test_train_step_sp.py).
    """
    latents = batch["latents"].astype(jnp.float32)
    B, T = latents.shape[:2]
    r_noise, r_off, r_t = jax.random.split(rng, 3)

    noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
    if cfg.noise_offset > 0:
        # per-sample, per-channel offset (train_stage1.py:489-493)
        off = jax.random.normal(r_off, (B, 1, 1, 1, latents.shape[-1]), jnp.float32)
        noise = noise + cfg.noise_offset * off

    t = jax.random.randint(r_t, (B,), 0, schedule.num_train_timesteps)
    noisy = schedule.add_noise(latents, noise, t)
    if cfg.prediction_type == "v_prediction":
        target = schedule.get_velocity(latents, noise, t)
    else:
        target = noise

    uncond = batch["uncond"].astype(jnp.float32)  # (B,)
    ctx = batch["clip_ctx"] * (1.0 - uncond)[:, None, None]

    if mesh is None or mesh_lib.FRAME_AXIS not in mesh.axis_names:
        pred = _models_forward(
            guide, den, params, noisy, t, ctx, batch["cond20"], batch["motion"], uncond
        )
    else:
        df = mesh.shape[mesh_lib.FRAME_AXIS]
        den_sp = den.clone(frame_axis=mesh_lib.FRAME_AXIS, frame_shards=df)
        p_bt = P(mesh_lib.DATA_AXIS, mesh_lib.FRAME_AXIS)
        p_b = P(mesh_lib.DATA_AXIS)
        fwd = shard_map(
            partial(_models_forward, guide, den_sp),
            mesh=mesh,
            in_specs=(P(), p_bt, p_b, p_b, p_bt, p_bt, p_b),
            out_specs=p_bt,
        )
        pred = fwd(params, noisy, t, ctx, batch["cond20"], batch["motion"], uncond)

    se = (pred - target.astype(jnp.float32)) ** 2
    per_sample = se.reshape(B, -1).mean(axis=1)
    if cfg.snr_gamma > 0:
        w = min_snr_loss_weight(schedule, t, cfg.snr_gamma, cfg.prediction_type)
        per_sample = per_sample * w
    loss = per_sample.mean()
    return loss, {"loss": loss, "t_mean": t.astype(jnp.float32).mean()}


def _partition(params, mask):
    """(trainable, frozen) trees with None placeholders (eqx-style)."""
    train = jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask)
    return train, frozen


def _combine(a, b):
    isnone = lambda x: x is None  # noqa: E731
    return jax.tree_util.tree_map(
        lambda x, y: y if x is None else x, a, b, is_leaf=isnone
    )


def make_train_step(
    cfg: TrainConfig,
    schedule: DDIMSchedule,
    guide: GuidanceUNet,
    den: DenoisingUNet,
    tx,
    mesh=None,
):
    """Returns a jittable (state, batch, rng) -> (state, metrics) step.

    Gradients are taken ONLY w.r.t. the trainable partition, and the optimizer
    update runs ONLY over that partition: differentiating or updating the full
    tree would materialize fp32 cotangents / zero-updates for every frozen SD
    weight (~8.7 GB at stage 2) — partitioning keeps the step inside a 16 GB
    chip and lets the frozen params alias straight through under donation.

    ``mesh``: a ('data', 'frame') mesh (core.mesh.choose_train_mesh) runs the
    model forwards frame-sharded (sequence parallelism); gradients flow
    through the shard_map (the all_to_all reshard transposes to its inverse,
    replicated params transpose to a psum) so the step is a drop-in."""

    def step(state: TrainState, batch, rng):
        mask = trainable_mask(state.params, cfg.trainable_substrings)
        train_p, frozen_p = _partition(state.params, mask)

        def loss_fn(tp):
            params = _combine(tp, frozen_p)
            return diffusion_loss(
                cfg, schedule, guide, den, params, batch, rng, mesh=mesh
            )

        (loss, metrics), tgrads = jax.value_and_grad(loss_fn, has_aux=True)(train_p)
        updates, opt_state = tx.update(tgrads, state.opt_state, train_p)
        params = _combine(optax.apply_updates(train_p, updates), frozen_p)
        new_state = TrainState(params, opt_state, state.step + 1)
        return new_state, metrics

    return step


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)
