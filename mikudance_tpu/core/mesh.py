"""Device-mesh and sharding helpers.

The reference's only parallelism is NCCL data-parallel via HF Accelerate
(`/root/reference/scripts/train_stage1.py:214-221`). TPU-native, that becomes a
`jax.sharding.Mesh` with a `data` axis over ICI; gradients all-reduce via the
XLA collectives `pjit` inserts (or explicit `psum` under `shard_map`). Frames /
sliding windows of a video shard over the same axis at inference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch / frame / window) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(tree, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place every array in `tree` with its leading axis sharded over `mesh`."""
    sharding = batch_sharded(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def zero_shard_state(tree, mesh: Mesh, axis_name: str = DATA_AXIS):
    """ZeRO-style optimizer/parameter sharding over the data axis.

    Stage 1 trains BOTH UNets (~1.7B params): fp32 params + grads + two Adam
    moments replicated per chip is ~27 GB — over a 16 GB v5e even before
    activations. The reference leans on 40+ GB GPUs; TPU-native, each leaf
    shards over ``axis_name`` along its largest divisible dimension
    (replicating small/indivisible leaves), XLA inserting the all-gathers /
    reduce-scatters from the sharding annotations — the jax.sharding
    equivalent of ZeRO/FSDP (SURVEY §2.6). Numerics are unchanged
    (tests/test_zero_sharding.py proves step parity vs replicated).
    """
    n = mesh.shape[axis_name]

    def place(x):
        x = jnp.asarray(x)
        best = None  # (dim_size, axis_index)
        for i, d in enumerate(x.shape):
            if d % n == 0 and d >= n and (best is None or d > best[0]):
                best = (d, i)
        if n == 1 or x.ndim == 0 or best is None:
            return jax.device_put(x, replicated(mesh))
        spec = [None] * x.ndim
        spec[best[1]] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(place, tree)


# ------------------------------------------------------- 2-D mesh factorization

WIN_AXIS = "win"  # CFG x sliding-window batch axis
FRAME_AXIS = "frame"  # frames within a window (sequence parallelism)


def _choose_2d_mesh(
    devices: Sequence[jax.Device],
    sizes: Tuple[int, int],
    axis_names: Tuple[str, str],
) -> Optional[Mesh]:
    """Largest (d0 * d1) <= len(devices) with d0 | sizes[0] and d1 | sizes[1],
    tie-broken toward more shards on axis 0 (the collective-free axis in both
    callers). Uses a device subset when n has no full factorization. None when
    only one device would be used."""
    n = len(devices)
    best = (1, 1)
    for d0 in range(1, n + 1):
        if sizes[0] % d0:
            continue
        for d1 in range(1, n // d0 + 1):
            if sizes[1] % d1:
                continue
            if (d0 * d1, d0) > (best[0] * best[1], best[0]):
                best = (d0, d1)
    d0, d1 = best
    if d0 * d1 <= 1:
        return None
    arr = np.asarray(list(devices[: d0 * d1])).reshape(d0, d1)
    return Mesh(arr, axis_names)


def choose_train_mesh(
    devices: Sequence[jax.Device], batch: int, frames: int
) -> Optional[Mesh]:
    """('data', 'frame') mesh for a training batch (B, T, ...).

    Stage-2 trains bs-1 20-frame clips (`configs/train/train_stage2.yaml`);
    one 576^2 20-frame sample does not fit a 16 GB chip even with remat, and
    data parallelism cannot split a SINGLE sample — so the frame axis shards
    too (sequence parallelism: every op in the step is frame-local except the
    motion modules, which reshard via all_to_all exactly as at inference).
    Prefer data shards (collective-free), then frame shards; axis sizes must
    divide B / T. None when only one device would be used.
    """
    return _choose_2d_mesh(devices, (batch, frames), (DATA_AXIS, FRAME_AXIS))


def shard_train_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a training batch on a 1-D data mesh or a 2-D ('data','frame')
    mesh: (B, T, ...) streams shard over both axes, per-sample arrays
    (clip_ctx, uncond, ...) over 'data' only."""
    if FRAME_AXIS not in mesh.axis_names:
        return shard_batch(batch, mesh)
    p_bt = NamedSharding(mesh, P(DATA_AXIS, FRAME_AXIS))
    p_b = NamedSharding(mesh, P(DATA_AXIS))

    def place(k, x):
        frame_sharded = x.ndim >= 2 and k in ("latents", "cond20", "motion")
        return jax.device_put(x, p_bt if frame_sharded else p_b)

    return {k: place(k, v) for k, v in batch.items()}


def choose_2d_mesh(
    devices: Sequence[jax.Device], batch: int, frames: int
) -> Optional[Mesh]:
    """('win', 'frame') mesh for the inference UNet batch (2*nw, wf, ...).

    The window/CFG axis is embarrassingly parallel (no collectives); the frame
    axis costs one all_to_all pair per motion module — so prefer window
    shards, then frame shards (e.g. 30-frame windows on 8 chips -> 6 devices).
    """
    return _choose_2d_mesh(devices, (batch, frames), (WIN_AXIS, FRAME_AXIS))
