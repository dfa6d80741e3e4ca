"""Checkpoint/resume/export via orbax.

Rebuilds the reference's two checkpoint mechanisms (SURVEY §5.4):
- full training state at a cadence with last-3 retention
  (`train_stage1.py:677-681`, ``delete_additional_ckpt`` `src/utils/util.py:35-48`)
  and resume-from-latest (`:452-467`) -> orbax ``CheckpointManager``;
- deployable per-component weights (`train_stage1.py:761-784`), including the
  stage-2 motion-module-only dict filtered by key substring
  (`train_stage2.py:898-926`) -> flax msgpack files.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp
from flax import serialization


def make_manager(directory: str, keep: int = 3) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_state(mgr: ocp.CheckpointManager, step: int, state) -> None:
    mgr.save(step, args=ocp.args.StandardSave(state))


def latest_step(mgr: ocp.CheckpointManager) -> Optional[int]:
    return mgr.latest_step()


def restore_state(mgr: ocp.CheckpointManager, state_like) -> Tuple[Any, int]:
    """Restore the newest checkpoint into the structure of ``state_like``."""
    step = mgr.latest_step()
    if step is None:
        return state_like, 0
    restored = mgr.restore(step, args=ocp.args.StandardRestore(state_like))
    return restored, int(step)


# ------------------------------------------------------------------ export

def export_params(params, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def import_params(params_like, path: str):
    with open(path, "rb") as f:
        return serialization.from_bytes(params_like, f.read())


def filter_by_substring(params, substrings) -> dict:
    """Subtree of params whose path contains any substring (the stage-2
    motion-module-only deployable dict, `train_stage2.py:898-926`)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        joined = "/".join(keys)
        if any(s in joined for s in substrings):
            node = out
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            node[keys[-1]] = leaf
    return out
