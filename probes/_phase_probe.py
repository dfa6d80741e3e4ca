"""Phase-by-phase timing with medians: each jitted program is timed ALONE
(3 repeats, median) so the phase numbers are additive and comparable to the
clean end-to-end median. Diagnoses the round-3 inconsistency (phase sum 34.5s
vs headline 24.0s)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import bench
from mikudance_tpu.core.configs import ContextConfig, PipelineConfig
from mikudance_tpu.diffusion.ddim import inference_step_pairs
from mikudance_tpu.pipelines import context as ctx_sched
from mikudance_tpu.pipelines.video import (VideoPipeline,
                                           build_condition_stack,
                                           guidance_context_for_windows)

bundle = bench.build_bundle()
cfg = PipelineConfig(width=bench.W, height=bench.H, num_inference_steps=20,
                     guidance_scale=3.5, context=ContextConfig(frames=30, overlap=8))
pipe = VideoPipeline(bundle, cfg)
rng = np.random.default_rng(0)
T, H, W, h, w = bench.T, bench.H, bench.W, bench.h, bench.w
inputs = bench.make_inputs(T, rng)


def med(fn, n=3, warm=1):
    for _ in range(warm):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


# --- H2D + normalize ---
raw = [inputs[0][None], inputs[1][None], inputs[2], inputs[3], inputs[4]]
stacked_np = np.concatenate(raw, axis=0)


def h2d():
    s = jnp.asarray(stacked_np)
    f = s.astype(jnp.float32)
    return jnp.concatenate([f[:1] / 127.5 - 1.0, f[1:] / 255.0], 0)


m, ts = med(h2d)
print(f"h2d_normalize: median {m:.3f}s  {['%.3f' % t for t in ts]}", flush=True)
all_frames = h2d()
jax.block_until_ready(all_frames)

# --- encode (device-resident input) ---
m, ts = med(lambda: pipe._encode_jit(bundle.vae_enc_params, all_frames, mesh=None))
print(f"vae_encode(device-resident): median {m:.3f}s  {['%.3f' % t for t in ts]}", flush=True)
lat = pipe._encode_jit(bundle.vae_enc_params, all_frames, mesh=None)
jax.block_until_ready(lat)

ref_l, skel_l = lat[0:1], lat[1:2]
pose_l = lat[2:2 + T]
face_l = lat[2 + T:2 + 2 * T]
hand_l = lat[2 + 2 * T:]
cond20 = build_condition_stack(ref_l, skel_l, pose_l, face_l, hand_l)
windows = ctx_sched.window_matrix(T, 30, 1, 8)
counts = jnp.asarray(ctx_sched.frame_counts(windows, T), jnp.float32)
nw, wf = windows.shape
flat = windows.reshape(-1)
ctx_cond = jnp.asarray(inputs[6])
g_ctx = guidance_context_for_windows(
    windows, ctx_cond, jnp.zeros_like(ctx_cond), cfg.guidance_clip_mode
).astype(bundle.guide.dtype)

# --- banks ---
m, ts = med(lambda: pipe._banks_jit(
    bundle.guide_params, cond20[flat].astype(bundle.guide.dtype),
    jnp.asarray(inputs[5])[flat].astype(bundle.guide.dtype), g_ctx, mesh=None))
print(f"guidance_banks: median {m:.3f}s  {['%.3f' % t for t in ts]}", flush=True)
banks = pipe._banks_jit(
    bundle.guide_params, cond20[flat].astype(bundle.guide.dtype),
    jnp.asarray(inputs[5])[flat].astype(bundle.guide.dtype), g_ctx, mesh=None)
jax.block_until_ready(banks)

ts_arr, prev_ts = inference_step_pairs(pipe.schedule, 20,
                                       spacing=cfg.scheduler.timestep_spacing)
noise = jnp.asarray(inputs[7])

# --- denoise ---
m, tl = med(lambda: pipe._denoise_jit(
    bundle.den_params, noise, banks, ctx_cond, jnp.asarray(windows), counts,
    jnp.asarray(ts_arr), jnp.asarray(prev_ts), jnp.float32(3.5),
    num_windows=nw, window_len=wf, mesh=None), n=3)
print(f"denoise(20 steps): median {m:.3f}s  {['%.3f' % t for t in tl]}", flush=True)
latents = pipe._denoise_jit(
    bundle.den_params, noise, banks, ctx_cond, jnp.asarray(windows), counts,
    jnp.asarray(ts_arr), jnp.asarray(prev_ts), jnp.float32(3.5),
    num_windows=nw, window_len=wf, mesh=None)
jax.block_until_ready(latents)

# --- decode + D2H ---
m, tl = med(lambda: pipe.decode_to_host(latents))
print(f"decode+D2H: median {m:.3f}s  {['%.3f' % t for t in tl]}", flush=True)

# --- clean end-to-end for comparison ---
m, tl = med(lambda: np.asarray(pipe(*inputs, to_host=True)), n=3, warm=1)
print(f"END-TO-END: median {m:.3f}s  {['%.3f' % t for t in tl]}", flush=True)
