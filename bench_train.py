"""Stage-2 training-step benchmark: 576^2, bs 1 (the reference's stage-2
geometry is 20-frame clips, `configs/train/train_stage2.yaml:1-24`) on the
real TPU chip.

Covers the perf paths the headline inference bench does not: the 5184-token
(576^2 / 8 -> 72x72) flash-attention blocks and the motion-module backward.

Clip length: the reference trains bs1/20f on 40+ GB GPUs; one v5e chip has
16 GB HBM, so the bench walks a frame ladder and reports the longest clip
that runs (10 frames: per-block remat + bf16 frozen storage + a
trainable-partition-only optimizer; the per-frame cost is what transfers;
stage-2 training at full clip length is a multi-chip job on v5e — the train
step shards over the data mesh, see __graft_entry__.dryrun_multichip).
Prints ONE JSON line like bench.py.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mikudance_tpu.core.configs import (  # noqa: E402
    DenoisingUNetConfig,
    GuidanceUNetConfig,
)
from mikudance_tpu.diffusion.ddim import DDIMSchedule  # noqa: E402
from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet  # noqa: E402
from mikudance_tpu.train.steps import (  # noqa: E402
    TrainConfig,
    init_train_state,
    make_train_step,
)

B, H, W = 1, 576, 576
h, w = H // 8, W // 8
DTYPE = jnp.bfloat16


def run_step(T: int):
    rng = jax.random.PRNGKey(0)
    guide = GuidanceUNet(GuidanceUNetConfig(), dtype=DTYPE, remat=True)
    den = DenoisingUNet(DenoisingUNetConfig(), dtype=DTYPE, remat=True)

    gp = jax.jit(guide.init)(
        rng, jnp.zeros((1, h, w, 20), DTYPE), jnp.zeros((1, h, w, 2), DTYPE),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 257, 768), DTYPE),
    )
    dp = jax.jit(den.init)(
        rng, jnp.zeros((1, 1, h, w, 4), DTYPE), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 257, 768), DTYPE),
    )

    cfg = TrainConfig(trainable_substrings=("motion", "man_"))  # stage-2 freeze set
    schedule = DDIMSchedule.create(beta_schedule="scaled_linear")
    state, tx = init_train_state(cfg, gp, dp, frozen_dtype=DTYPE)
    step = jax.jit(make_train_step(cfg, schedule, guide, den, tx), donate_argnums=0)

    rnp = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rnp.normal(size=(B, T, h, w, 4)), jnp.float32),
        "cond20": jnp.asarray(rnp.normal(size=(B, T, h, w, 20)), jnp.float32),
        "motion": jnp.asarray(rnp.normal(size=(B, T, h, w, 2)), jnp.float32),
        "clip_ctx": jnp.asarray(rnp.normal(size=(B, 257, 768)), jnp.float32),
        "uncond": jnp.zeros((B,), jnp.float32),
    }

    state, m = step(state, batch, jax.random.PRNGKey(1))  # compile
    float(m["loss"])  # sync
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.PRNGKey(2 + i))
        loss = float(m["loss"])  # force completion
        times.append(time.perf_counter() - t0)
    assert np.isfinite(loss)
    return float(np.median(times))


def main():
    import subprocess
    import sys

    if len(sys.argv) > 1:  # child mode: one geometry, clean device state
        T = int(sys.argv[1])
        sec = run_step(T)
        print(json.dumps({
            "metric": f"sec per stage-2 train step (576^2, bs1, {T} frames, 1x v5e)",
            "value": round(sec, 3),
            "unit": "s",
            "vs_baseline": None,
        }))
        return

    # parent: walk the frame ladder, one subprocess per geometry so a failed
    # (OOM) attempt cannot leak device buffers into the next one. 10 frames is
    # the measured 16 GB ceiling: the step's live set is ~9.0 GB static
    # (frozen bf16 params + trainable fp32 + adam moments) + ~0.65 GB/frame
    # of rematerialized activations (memory_analysis: temp 6.54 GB at T=10,
    # peak 15.5 GB), so 14/20-frame attempts only waste their ~20-min remote
    # compiles before the inevitable runtime OOM.
    for T in (10, 6, 4):
        r = subprocess.run(
            [sys.executable, __file__, str(T)], capture_output=True, text=True,
            timeout=1700,
        )
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
        sys.stderr.write(f"[bench_train] {T} frames failed "
                         f"(rc={r.returncode}): {r.stderr.strip()[-400:]}\n")
    raise SystemExit("no clip length fit")


if __name__ == "__main__":
    main()
