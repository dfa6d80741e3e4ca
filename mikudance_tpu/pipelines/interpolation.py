"""Latent frame interpolation (linear / slerp).

Rebuilds `/root/reference/src/pipelines/utils.py:6-29` and the pipeline's
``interpolate_latents`` (`pipeline_mikudance.py:317-360`): inserts
``2^(factor-1) - 1`` interpolated latents between consecutive frames to
upsample the frame rate post-hoc. (Note: the shipped reference never sets a
tensor interpolator, so factor > 1 would crash there; here slerp is the
default and factor=1 is the no-op.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lerp(v0: jnp.ndarray, v1: jnp.ndarray, t: float) -> jnp.ndarray:
    return (1.0 - t) * v0 + t * v1


def slerp(v0: jnp.ndarray, v1: jnp.ndarray, t: float, dot_threshold: float = 0.9995):
    """Spherical interpolation over flattened latents (utils.py:19-29)."""
    u0 = v0 / jnp.linalg.norm(v0)
    u1 = v1 / jnp.linalg.norm(v1)
    d = jnp.clip(jnp.sum(u0 * u1), -1.0, 1.0)
    theta = jnp.arccos(d) * t
    v2 = v1 - v0 * d
    norm = jnp.linalg.norm(v2)
    v2 = jnp.where(norm > 1e-12, v2 / jnp.maximum(norm, 1e-12), jnp.zeros_like(v2))
    slerped = v0 * jnp.cos(theta) + v2 * jnp.sin(theta) * jnp.linalg.norm(v0)
    return jnp.where(jnp.abs(d) > dot_threshold, lerp(v0, v1, t), slerped)


def interpolate_latents(
    latents: jnp.ndarray,  # (T, h, w, c)
    factor: int,
    mode: str = "slerp",
) -> jnp.ndarray:
    """Insert 2^(factor-1)-1 frames between consecutive latents.

    Vectorized over all (pair, t) combinations so it traces to a handful of
    fused XLA ops (the reference loops pairs in Python,
    `pipeline_mikudance.py:330-356`). Wired into ``VideoPipeline.__call__``
    via ``PipelineConfig.interpolation_factor`` (reference call site
    `pipeline_mikudance.py:688`).
    """
    if factor <= 1:
        return latents
    fn = slerp if mode == "slerp" else lerp
    n_insert = 2 ** (factor - 1) - 1
    T = latents.shape[0]
    a = latents[:-1].reshape(T - 1, -1)  # (T-1, D)
    b = latents[1:].reshape(T - 1, -1)
    ts = jnp.arange(1, n_insert + 1, dtype=jnp.float32) / (n_insert + 1)
    pair_fn = jax.vmap(fn, in_axes=(0, 0, None))  # over frame pairs
    mids = jax.vmap(pair_fn, in_axes=(None, None, 0), out_axes=1)(a, b, ts)
    seq = jnp.concatenate([a[:, None], mids], axis=1)  # (T-1, 1+n, D)
    out = seq.reshape((T - 1) * (1 + n_insert), a.shape[-1])
    out = jnp.concatenate([out, b[-1:]], axis=0)
    return out.reshape((-1,) + latents.shape[1:])
