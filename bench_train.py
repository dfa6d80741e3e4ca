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
    # the fp32 init trees stay alive as locals otherwise — ~9 GB of HBM the
    # 16 GB chip cannot spare next to the ~12.4 GB step (frozen leaves were
    # COPIED to bf16 by init_train_state; trainable leaves are shared and
    # survive this del)
    import gc

    del gp, dp
    gc.collect()
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


def run_stage1_grad_step(bs: int):
    """Stage-1 fwd+bwd (full ~1.7B trainable set) at the reference geometry
    (768^2 single frames, `configs/train/train_stage1.yaml:1-19`).

    MEMORY WALL (why this measures gradients, not a full Adam step): stage 1
    trains BOTH UNets (~1.7B params). A standard fp32 Adam step needs
    4 (master) + 4 (m) + 4 (v) = 12 bytes/param of optimizer-side state =
    ~20.4 GB — more than one v5e chip's 16 GB HBM at ANY batch/resolution.
    The shipping configuration ZeRO-shards that state over the data mesh
    (core/mesh.py::zero_shard_state, >= 2 chips: ~10.2 GB/chip + bf16
    params; validated on the 8-device CPU mesh in tests/test_zero_sharding.py
    and the driver's dryrun). The on-chip-measurable part is the compute:
    fwd+bwd over bf16 params with bf16 cotangents (3.4 GB params + 3.4 GB
    grads + remat activations). The Adam update itself is elementwise and
    bandwidth-bound: ~28 GB of state traffic / chip-pair bandwidth adds
    ~25 ms/step unsharded — noise next to the measured fwd+bwd seconds.
    """
    from mikudance_tpu.train.steps import diffusion_loss

    rng = jax.random.PRNGKey(0)
    H1 = W1 = 768
    h1, w1 = H1 // 8, W1 // 8
    guide = GuidanceUNet(GuidanceUNetConfig(use_man=False), dtype=DTYPE, remat=True)
    from mikudance_tpu.core.configs import MotionModuleConfig
    den = DenoisingUNet(
        DenoisingUNetConfig(motion=MotionModuleConfig(enabled=False)),
        dtype=DTYPE, remat=True,
    )
    gp = jax.jit(guide.init)(
        rng, jnp.zeros((1, h1, w1, 20), DTYPE), jnp.zeros((1, h1, w1, 2), DTYPE),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 257, 768), DTYPE),
    )
    dp = jax.jit(den.init)(
        rng, jnp.zeros((1, 1, h1, w1, 4), DTYPE), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 257, 768), DTYPE),
    )
    params = {"guide": gp["params"], "den": dp["params"]}
    cfg = TrainConfig(trainable_substrings=None)  # stage 1 trains everything
    schedule = DDIMSchedule.create(
        beta_schedule="scaled_linear", prediction_type="v_prediction",
        rescale_betas_zero_snr=True,
    )

    def gstep(p, batch, key):
        def loss_fn(pp):
            return diffusion_loss(cfg, schedule, guide, den, pp, batch, key)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                          for g in jax.tree_util.tree_leaves(grads)))
        return loss, gn

    step = jax.jit(gstep)
    rnp = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rnp.normal(size=(bs, 1, h1, w1, 4)), jnp.float32),
        "cond20": jnp.asarray(rnp.normal(size=(bs, 1, h1, w1, 20)), jnp.float32),
        "motion": jnp.zeros((bs, 1, h1, w1, 2), jnp.float32),
        "clip_ctx": jnp.asarray(rnp.normal(size=(bs, 257, 768)), jnp.float32),
        "uncond": jnp.zeros((bs,), jnp.float32),
    }
    loss, gn = step(params, batch, jax.random.PRNGKey(1))
    float(loss)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        loss, gn = step(params, batch, jax.random.PRNGKey(2 + i))
        assert np.isfinite(float(loss)) and np.isfinite(float(gn))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import subprocess
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "stage1":  # child mode
        bs = int(sys.argv[2])
        sec = run_stage1_grad_step(bs)
        print(json.dumps({
            "metric": f"sec per stage-1 fwd+bwd (768^2, bs{bs}, both UNets "
                      "trainable, 1x v5e; full fp32 Adam state is 20.4 GB "
                      "> one chip -> ZeRO-shards over the data mesh)",
            "value": round(sec, 3),
            "unit": "s",
            "vs_baseline": None,
        }))
        return

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
    done_stage2 = False
    for T in (10, 6, 4):
        r = subprocess.run(
            [sys.executable, __file__, str(T)], capture_output=True, text=True,
            timeout=1700,
        )
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                done_stage2 = True
                break
        if done_stage2:
            break
        sys.stderr.write(f"[bench_train] {T} frames failed "
                         f"(rc={r.returncode}): {r.stderr.strip()[-400:]}\n")
    if not done_stage2:
        raise SystemExit("no stage-2 clip length fit")

    # stage-1: fwd+bwd over the full trainable set (see run_stage1_grad_step's
    # memory-wall note for why the optimizer update is measured analytically)
    for bs in (4, 2, 1):
        r = subprocess.run(
            [sys.executable, __file__, "stage1", str(bs)], capture_output=True,
            text=True, timeout=1700,
        )
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
        sys.stderr.write(f"[bench_train] stage-1 bs{bs} failed "
                         f"(rc={r.returncode}): {r.stderr.strip()[-400:]}\n")
    raise SystemExit("no stage-1 batch size fit")


if __name__ == "__main__":
    main()
