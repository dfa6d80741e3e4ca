"""Tuned XLA:TPU compile options for the hot programs.

Swept on the real chip (round 5, `probes/_flag_sweep.py` →
`probes/flag_sweep_results.json`, summarized in PROFILE.md): of 14
XLA:TPU tuning options delivered via `jax.jit(compiler_options=...)` —
the only channel that reaches the remote axon compiler; XLA_FLAGS dies in
the local client — exactly one reproducibly wins on the 768^2 denoise:
the bundle-aware fusion cost model (~1.3%: 4.100 → 4.045 s on the 4-step
A/B, interleaved re-measure). Everything else was neutral to worse.

`tuned_jit` applies it on TPU backends only: other backends (the CPU test
mesh, the driver dryrun) reject unknown TPU options at compile time.
"""

from __future__ import annotations

import jax

TUNED_TPU_OPTIONS = {
    "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true",
}


def tuned_jit(fun, **kw):
    """``jax.jit`` with the swept TPU compile options (TPU backends only)."""
    try:
        backend = jax.default_backend()
    except Exception:  # backend init failure: plain jit, let callers surface it
        backend = "cpu"
    if backend not in ("cpu", "gpu", "cuda", "rocm"):
        kw.setdefault("compiler_options", dict(TUNED_TPU_OPTIONS))
    return jax.jit(fun, **kw)
