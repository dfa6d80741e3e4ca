"""Tracing/profiling helpers (the reference has none — SURVEY §5.1).

- ``trace(...)``: context manager around ``jax.profiler`` writing an xplane
  trace viewable in TensorBoard/XProf.
- ``op_profile_summary``: parse a trace into the top op categories (used to
  find the HBM-bound temporal-attention transposes, for example).
- ``Timer``: wall-time phases with a device-sync via value materialization
  (``jax.block_until_ready`` does not reliably wait through the axon tunnel).
"""

from __future__ import annotations

import contextlib
import glob
import json
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force(x) -> float:
    """Synchronize by materializing a scalar on host (returns the value)."""
    leaves = jax.tree_util.tree_leaves(x)
    return float(leaves[0].astype(jnp.float32).sum()) if leaves else 0.0


class Timer:
    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            force(sync_on)
        self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{k}: {v:.3f}s ({100*v/max(total,1e-9):.0f}%)" for k, v in self.phases.items()]
        return " | ".join(lines) + f" | total {total:.3f}s"


def op_profile_summary(log_dir: str, top: int = 12) -> List[Tuple[float, str]]:
    """Top op categories by self time from an xplane trace (needs xprof)."""
    return [(t, f"{prog} :: {cat}") for t, prog, cat, _ in
            op_profile_rows(log_dir, depth=2)[:top]]


def op_profile_rows(log_dir: str, depth: int = 3):
    """Rows (self_time, program, category, op_name) from an xplane trace,
    sorted by self time descending. depth=2 aggregates per (program,
    category); depth=3 gives individual fused ops — the names carry the HLO
    op (e.g. 'fusion.123') plus xprof's provenance suffix where present."""
    from xprof.convert import raw_to_tool_data as rtd

    # one session only: mixing xplane files from different profile sessions
    # makes the converter return None
    files = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.xplane.pb"))[-1:]
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
    d = json.loads(data) if isinstance(data, (str, bytes)) else data

    rows = []

    def walk(node, dep, prog, cat):
        name = node.get("name", "?")
        if dep == 1:
            prog = name
        elif dep == 2:
            cat = name
        m = node.get("metrics", {})
        t = m.get("rawTime", m.get("time", 0))
        if dep == depth and t:
            rows.append((float(t), prog or "?", cat or "?",
                         name if depth >= 3 else ""))
        if dep < depth:
            for c in node.get("children", []):
                walk(c, dep + 1, prog, cat)

    walk(d.get("byProgram", {}), 0, None, None)
    rows.sort(reverse=True)
    return rows
