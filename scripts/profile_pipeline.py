"""Op-level profile of the headline pipeline on the real TPU chip.

Runs one full VideoPipeline call (bench.py geometry) under jax.profiler and
prints the top op categories by self time — the tool that directs kernel work
(verdict round 1: find where the 35 s actually goes).

Usage: python scripts/profile_pipeline.py [--steps 4] [--logdir /tmp/mdtrace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--logdir", default="/tmp/mdtrace")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    import bench
    from mikudance_tpu.core.configs import ContextConfig, PipelineConfig
    from mikudance_tpu.pipelines.video import VideoPipeline
    from mikudance_tpu.utils.profiling import op_profile_summary, trace

    bundle = bench.build_bundle()
    cfg = PipelineConfig(
        width=bench.W, height=bench.H, num_inference_steps=args.steps,
        guidance_scale=3.5, context=ContextConfig(frames=30, overlap=8),
    )
    pipe = VideoPipeline(bundle, cfg)

    rng = np.random.default_rng(0)
    T, H, W, h, w = bench.T, bench.H, bench.W, bench.h, bench.w
    inputs = (
        rng.integers(0, 256, (H, W, 3), dtype=np.uint8),
        rng.integers(0, 256, (H, W, 3), dtype=np.uint8),
        rng.integers(0, 256, (T, H, W, 3), dtype=np.uint8),
        np.zeros((T, H, W, 3), np.uint8),
        np.zeros((T, H, W, 3), np.uint8),
        np.zeros((T, h, w, 2), np.float32),
        rng.normal(0, 1, (1, 257, 768)).astype(np.float32),
        rng.normal(0, 1, (T, h, w, 4)).astype(np.float32),
    )

    np.asarray(pipe(*inputs))  # warmup/compile
    t0 = time.perf_counter()
    np.asarray(pipe(*inputs))
    print(f"steady-state: {time.perf_counter() - t0:.2f}s for {args.steps} steps")

    # ---- phase timing (host-visible): H2D, encode, banks, denoise, decode, D2H
    import jax.numpy as jnp

    from mikudance_tpu.diffusion.ddim import inference_step_pairs
    from mikudance_tpu.pipelines import context as ctx_sched
    from mikudance_tpu.pipelines.video import (
        build_condition_stack, guidance_context_for_windows)

    cfgc = pipe.config
    t0 = time.perf_counter()
    from mikudance_tpu.pipelines.video import to_unit_float
    all_frames = jnp.concatenate(
        [to_unit_float(inputs[0], True)[None], to_unit_float(inputs[1], False)[None],
         to_unit_float(inputs[2], False), to_unit_float(inputs[3], False),
         to_unit_float(inputs[4], False)], 0)
    all_frames.block_until_ready()
    print(f"H2D frames ({all_frames.nbytes/1e6:.0f} MB): {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    lat = pipe._encode_jit(bundle.vae_enc_params, all_frames, mesh=None)
    lat.block_until_ready()
    print(f"VAE encode (50 frames): {time.perf_counter()-t0:.2f}s")

    ref_l, skel_l = lat[0:1], lat[1:2]
    cond20 = build_condition_stack(ref_l, skel_l, lat[2:2+T], lat[2+T:2+2*T], lat[2+2*T:])
    windows = ctx_sched.window_matrix(T, cfgc.context.frames, cfgc.context.stride,
                                      cfgc.context.overlap)
    counts = jnp.asarray(ctx_sched.frame_counts(windows, T), jnp.float32)
    flat = windows.reshape(-1)
    ctx_cond = jnp.asarray(inputs[6])
    g_ctx = guidance_context_for_windows(
        windows, ctx_cond, jnp.zeros_like(ctx_cond), cfgc.guidance_clip_mode
    ).astype(bundle.guide.dtype)

    t0 = time.perf_counter()
    banks = pipe._banks_jit(
        bundle.guide_params, cond20[flat].astype(bundle.guide.dtype),
        jnp.asarray(inputs[5])[flat].astype(bundle.guide.dtype), g_ctx, mesh=None)
    jax.block_until_ready(banks)
    print(f"guidance banks ({windows.size} frames): {time.perf_counter()-t0:.2f}s")

    from mikudance_tpu.diffusion.ddim import inference_step_pairs
    ts, prev_ts = inference_step_pairs(pipe.schedule, args.steps)
    t0 = time.perf_counter()
    latents = pipe._denoise_jit(
        bundle.den_params, jnp.asarray(inputs[7]), banks, ctx_cond,
        jnp.asarray(windows), counts, jnp.asarray(ts), jnp.asarray(prev_ts),
        jnp.float32(3.5), num_windows=windows.shape[0],
        window_len=windows.shape[1], mesh=None)
    latents.block_until_ready()
    print(f"denoise scan ({args.steps} steps): {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    video = pipe._decode_jit(bundle.vae_dec_params, latents, mesh=None)
    video.block_until_ready()
    print(f"VAE decode (16 frames): {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    np.asarray(video)
    print(f"D2H video ({video.nbytes/1e6:.0f} MB): {time.perf_counter()-t0:.2f}s")

    with trace(args.logdir):
        np.asarray(pipe(*inputs))

    for t, name in op_profile_summary(args.logdir, top=args.top):
        print(f"{t:14.1f}  {name}")


if __name__ == "__main__":
    main()
