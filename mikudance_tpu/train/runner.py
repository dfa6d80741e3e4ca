"""Shared training-loop runner for both stages.

The TPU-native equivalent of the reference trainers' scaffolding
(`/root/reference/scripts/train_stage1.py:213-734`, `train_stage2.py:282-860`):
Accelerate/DDP becomes a 1-D data mesh + jitted SPMD step; mlflow becomes a
JSONL metrics log (mlflow attaches automatically when importable); checkpoint
cadence, last-3 retention, resume-from-latest, and deployable weight export
mirror the reference's behavior.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import mesh as mesh_lib
from ..diffusion.ddim import DDIMSchedule
from ..models.vae import latent_mean, latent_sample
from ..pipelines.video import SD_LATENT_SCALE
from . import checkpoint as ckpt_lib
from .steps import TrainConfig, TrainState, init_train_state, make_train_step


class MetricsLogger:
    """JSONL + optional mlflow (`train_stage1.py:218,421-428,674`)."""

    def __init__(self, out_dir: str, run_name: str):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._mlflow = None
        try:  # pragma: no cover - mlflow absent in this image
            import mlflow

            mlflow.start_run(run_name=run_name)
            self._mlflow = mlflow
        except Exception:
            pass

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._mlflow:
            self._mlflow.log_metrics(metrics, step=step)

    def log_artifact(self, step: int, path: str) -> None:
        """Validation media to the tracker: mlflow artifact when attached
        (the reference logs validation GIFs to mlflow,
        `train_stage1.py:698-706`); the JSONL records the path either way."""
        rec = {"step": step, "time": time.time(), "artifact": path}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._mlflow:
            try:
                self._mlflow.log_artifact(path, artifact_path=f"step_{step}")
            except Exception:
                pass


@dataclasses.dataclass
class EncoderFns:
    """Frozen encoders used to prepare batches on device."""

    vae_encode_sample: Callable  # (rng, imgs NHWC [-1,1]) -> scaled latents
    vae_encode_mean: Callable  # (imgs) -> scaled latents
    clip_encode: Callable  # (clip pixel values NHWC) -> (B, S, 768)


def make_encoder_fns(vae_enc, vae_params, clip, clip_params) -> EncoderFns:
    @jax.jit
    def enc_sample(rng, imgs):
        moments = vae_enc.apply(vae_params, imgs)
        return latent_sample(moments, rng) * SD_LATENT_SCALE

    @jax.jit
    def enc_mean(imgs):
        return latent_mean(vae_enc.apply(vae_params, imgs)) * SD_LATENT_SCALE

    @jax.jit
    def clip_fn(px):
        return clip.apply(clip_params, px)

    return EncoderFns(enc_sample, enc_mean, clip_fn)


def train_loop(
    *,
    cfg: TrainConfig,
    schedule: DDIMSchedule,
    guide,
    guide_params,
    den,
    den_params,
    batches: Any,  # Iterable (one pass) or re-iterable / zero-arg factory (epochs)
    prepare_batch: Callable[[Dict[str, np.ndarray], random.Random], Dict[str, jnp.ndarray]],
    max_steps: int,
    output_dir: str,
    run_name: str,
    checkpointing_steps: int = 3000,
    log_every: int = 10,
    seed: int = 186,
    validation_fn: Optional[Callable[[int, TrainState], None]] = None,
    validation_steps: int = 3000,
    export_fn: Optional[Callable[[int, TrainState], None]] = None,
    save_model_steps: int = 3000,
    save_model_epochs: int = 0,  # reference's save_model_epoch_interval; 0 = off
    batch_size: int = 0,
    clip_frames: int = 1,
    frozen_dtype=None,
    zero_shard: bool = False,
) -> TrainState:
    # batch_size + clip_frames > 0 activate the ('data', 'frame') training
    # mesh: frames of one clip shard too (sequence parallelism), which is what
    # lets stage 2 train the reference's full 20-frame clips on a v5e-8 when
    # one sample does not fit a chip. Plain 1-D data mesh otherwise.
    mesh = None
    if batch_size > 0:
        mesh = mesh_lib.choose_train_mesh(jax.devices(), batch_size, clip_frames)
    sp = mesh is not None and mesh.shape.get(mesh_lib.FRAME_AXIS, 1) > 1
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    if sp:
        print(f"training mesh: {dict(mesh.shape)} (sequence-parallel frames)")
    # frozen_dtype (e.g. bf16 at stage 2) stores the non-trainable partition
    # compactly; donation lets XLA update the state in place instead of
    # double-buffering ~9 GB of params + moments (see bench_train.py, which
    # measured both as required to fit a 16 GB chip).
    state, tx = init_train_state(cfg, guide_params, den_params, frozen_dtype=frozen_dtype)
    # drop the input trees: when a caller passes DEVICE arrays (the CLI
    # trainers pass host numpy, but tests/benches init on device), the fp32
    # originals of every frozen-partition leaf would otherwise stay resident
    # next to their bf16 copies for the whole run
    del guide_params, den_params
    mgr = ckpt_lib.make_manager(os.path.join(output_dir, "checkpoints"), keep=3)
    state, start_step = ckpt_lib.restore_state(mgr, state)
    if start_step:
        print(f"resumed from checkpoint step {start_step}")

    step_fn = jax.jit(
        make_train_step(cfg, schedule, guide, den, tx, mesh=mesh if sp else None),
        donate_argnums=0,
    )
    # zero_shard: params + optimizer state shard over the data axis instead
    # of replicating (ZeRO/FSDP-style; core/mesh.py::zero_shard_state). Stage
    # 1 trains ~1.7B params — replicated fp32 state is ~27 GB/chip, over a
    # 16 GB v5e; sharded over a v5e-8 it is ~3.4 GB/chip.
    if zero_shard and not sp:
        state = mesh_lib.zero_shard_state(state, mesh)
    else:
        state = mesh_lib.replicate(state, mesh)
    logger = MetricsLogger(output_dir, run_name)
    host_rng = random.Random(seed)
    key = jax.random.PRNGKey(seed)

    step = start_step
    t0 = time.time()
    # `step`, max_steps, and every cadence below count OPTIMIZER steps, like
    # the reference (global_step advances only on sync_gradients,
    # `train_stage1.py:669-677`): with gradient accumulation each counted
    # step is `accum` micro-batches, and optax.MultiSteps fires the inner
    # update (and advances the LR schedule) once per counted step.
    accum = max(1, cfg.gradient_accumulation_steps)
    micro = 0
    # Epoch cycling: the reference DataLoader loops per epoch until max_steps
    # (`train_stage1.py:470-478`); re-iterate `batches` (each __iter__ of
    # PrefetchLoader reshuffles) until the step budget is spent. A plain
    # generator exhausts after one pass and ends the loop (synthetic runs).
    epoch = 0
    while step < max_steps:
        epoch_iter = iter(batches() if callable(batches) else batches)
        saw_batch = False
        while step < max_steps:
            try:  # budget checked BEFORE the fetch: don't load a batch just to drop it
                batch = next(epoch_iter)
            except StopIteration:
                break
            saw_batch = True
            dev_batch = prepare_batch(batch, host_rng)
            dev_batch = mesh_lib.shard_train_batch(dev_batch, mesh)
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, dev_batch, sub)
            micro += 1
            if micro % accum:
                continue  # mid-accumulation: no optimizer step happened
            step += 1

            if step % log_every == 0:
                loss = float(metrics["loss"])
                dt = (time.time() - t0) / log_every
                t0 = time.time()
                logger.log(step, {"train_loss": loss, "sec_per_step": dt, "epoch": epoch})
                print(f"step {step}: loss={loss:.5f} ({dt:.2f}s/step)")
            if step % checkpointing_steps == 0:
                ckpt_lib.save_state(mgr, step, jax.device_get(state))
            if validation_fn and step % validation_steps == 0:
                # a returned path is validation media: route it to the
                # tracker (mlflow artifact / JSONL record)
                artifact = validation_fn(step, state)
                if isinstance(artifact, str):
                    logger.log_artifact(step, artifact)
            if export_fn and step % save_model_steps == 0:
                export_fn(step, state)
        if not saw_batch:
            break  # exhausted generator or empty dataset: no more data
        epoch += 1
        # deployable export at epoch boundaries too (`train_stage1.py:736-760`)
        if export_fn and save_model_epochs and epoch % save_model_epochs == 0:
            export_fn(step, state)

    mgr.wait_until_finished()
    return state
