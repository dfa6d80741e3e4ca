"""Camera trajectory + depth -> 2-channel scene-motion flow field.

Rebuilds ``camera_to_scene_motion`` (`/root/reference/tools/scene_motion_tracking.py:14-67`)
in jnp (a numpy twin is kept as the unit-test oracle): back-project a
latent-resolution pixel grid at depth ``z = 100 - 50*depth``, transform frame
t's points by ``w2c[t+1] @ c2w[t]``, re-project through the pinhole K, and take
the 2D displacement. 3-sigma clipping; frame 0 is zero flow. Output layout is
(T, h, w, 2) NHWC (the reference emits (T, 2, h, w)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Pinhole intrinsics used at inference (`/root/reference/scripts/inference_video.py:185`).
DEFAULT_K = (3.2, 3.2, 1.6, 1.6)


def _k_matrix(K) -> np.ndarray:
    fx, fy, cx, cy = K
    M = np.zeros((3, 4))
    M[0, 0], M[1, 1], M[0, 2], M[1, 2], M[2, 2] = fx, fy, cx, cy, 1.0
    return M


def scene_motion_flow(
    w2c: jnp.ndarray,  # (T, 4, 4)
    c2w: jnp.ndarray,  # (T, 4, 4)
    depth: jnp.ndarray,  # (h, w) in [0, 1]
    K=DEFAULT_K,
) -> jnp.ndarray:
    """Returns (T, h, w, 2) float32 flow; frame 0 is zero."""
    T = w2c.shape[0]
    h, w = depth.shape
    Km = jnp.asarray(_k_matrix(K), dtype=jnp.float32)

    # Python floor-division semantics, matching the reference's
    # ``np.arange(-width // 2, width // 2)`` (scene_motion_tracking.py:18-19):
    # for ODD sizes the grid starts at -(w+1)//2, not -(w//2).
    x0, y0 = -w // 2, -h // 2
    xs = jnp.arange(x0, x0 + w, dtype=jnp.float32)
    ys = jnp.arange(y0, y0 + h, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(xs, ys)  # (h, w)
    zz = 100.0 - depth.astype(jnp.float32) * 50.0

    pts = jnp.stack(
        [xx.reshape(-1), yy.reshape(-1), zz.reshape(-1), jnp.ones(h * w)], axis=-1
    )  # (hw, 4)

    img0 = pts @ Km.T  # (hw, 3)
    img0 = img0[:, :2] / img0[:, 2:3]

    world = jnp.einsum("tij,aj->tai", c2w.astype(jnp.float32), pts)  # (T, hw, 4)
    cam = jnp.einsum("tij,taj->tai", w2c[1:].astype(jnp.float32), world[:-1])
    img = jnp.einsum("ij,taj->tai", Km, cam)
    img = img[..., :2] / img[..., 2:3]

    flow = img - img0[None]  # (T-1, hw, 2)

    mean, std = jnp.mean(flow), jnp.std(flow)
    clipped = jnp.clip(flow, mean - 3 * std, mean + 3 * std)
    # The reference zeroes the flow when it is non-finite (scene_motion_tracking.py:53-65).
    ok = jnp.all(jnp.isfinite(flow))
    clipped = jnp.where(ok, clipped, jnp.zeros_like(clipped))

    flow_t = clipped.reshape(T - 1, h, w, 2)
    return jnp.concatenate([jnp.zeros((1, h, w, 2), flow_t.dtype), flow_t], axis=0)


def scene_motion_flow_np(w2c, c2w, depth, K=DEFAULT_K) -> np.ndarray:
    """Pure-numpy twin (unit-test oracle), same math/layout as the jnp version."""
    T = w2c.shape[0]
    h, w = depth.shape
    Km = _k_matrix(K)

    x0, y0 = -w // 2, -h // 2  # Python floor division: reference grid origin
    xs = np.arange(x0, x0 + w, dtype=np.float64)
    ys = np.arange(y0, y0 + h, dtype=np.float64)
    xx, yy = np.meshgrid(xs, ys)
    zz = 100.0 - depth.astype(np.float64) * 50.0
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel(), np.ones(h * w)], axis=-1)

    img0 = pts @ Km.T
    img0 = img0[:, :2] / img0[:, 2:3]

    world = np.einsum("tij,aj->tai", np.asarray(c2w, np.float64), pts)
    cam = np.einsum("tij,taj->tai", np.asarray(w2c, np.float64)[1:], world[:-1])
    img = np.einsum("ij,taj->tai", Km, cam)
    img = img[..., :2] / img[..., 2:3]
    flow = img - img0[None]

    out = np.zeros((T, h, w, 2), dtype=np.float32)
    if np.isfinite(flow).all():
        mean, std = flow.mean(), flow.std()
        flow = np.clip(flow, mean - 3 * std, mean + 3 * std)
        out[1:] = flow.reshape(T - 1, h, w, 2)
    return out
