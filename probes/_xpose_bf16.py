"""UniPose bf16 compute probe (VERDICT r4 #9): the 3.96 s XPose forward is
~68% gather-bound at fp32; bf16 halves gather bytes. A/B time + output drift
at the video driver's geometry (bs=10, 800^2, 900 queries).

Run: python probes/_xpose_bf16.py   (real chip, ~5 min incl. compiles)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mikudance_tpu.toolbox.unipose import UniPose
from mikudance_tpu.utils.profiling import force

rng = np.random.default_rng(0)
B, H, W = 10, 800, 800
img = jnp.asarray(rng.normal(0, 1, (B, H, W, 3)).astype(np.float32))
obj = jnp.asarray(rng.normal(0, 1, (B, 4, 512)).astype(np.float32))
msk = jnp.ones((B, 4), bool)
kpt = jnp.asarray(rng.normal(0, 1, (B, 68, 512)).astype(np.float32))
vis = jnp.ones((B, 68), np.float32)

rng2 = jax.random.PRNGKey(0)
params = jax.jit(UniPose().init)(rng2, img[:1], obj[:1], msk[:1], kpt[:1], vis[:1])

results = {}
outs = {}
for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
    model = UniPose(dtype=dtype)
    fwd = jax.jit(model.apply)
    out = fwd(params, img, obj, msk, kpt, vis)
    force(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(fwd(params, img, obj, msk, kpt, vis))
        times.append(time.perf_counter() - t0)
    results[name] = float(np.median(times))
    outs[name] = jax.tree.map(lambda x: np.asarray(x, np.float32), out)
    print(f"{name}: {results[name]:.3f} s / {B}-frame forward", flush=True)

# Output drift: the drivers consume sigmoid(logits) thresholded + box/keypoint
# coords in [0,1]; report max and 99.9th-percentile drift per leaf.
flat32 = jax.tree_util.tree_leaves_with_path(outs["fp32"])
flat16 = jax.tree_util.tree_leaves(outs["bf16"])
for (path, a), b in zip(flat32, flat16):
    d = np.abs(a - b)
    print(f"  drift {jax.tree_util.keystr(path)}: max {d.max():.4g}  "
          f"p99.9 {np.quantile(d, 0.999):.4g}")
print(f"SPEEDUP bf16 vs fp32: {results['fp32'] / results['bf16']:.2f}x "
      f"({results['fp32']:.3f} -> {results['bf16']:.3f} s)")
