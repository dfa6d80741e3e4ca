"""A/B the denoise program only: Pallas norm kernels on/off.

Usage: python _ab_norms.py <variant>, variant in
  base | ln | gn | lngn   (which PREFER_PALLAS flags to flip on)
4 steps, headline geometry. Prints DENOISE_SECONDS."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mikudance_tpu.kernels import group_norm as gn_k
from mikudance_tpu.kernels import layer_norm as ln_k

arg = sys.argv[1]
ln_k.PREFER_PALLAS = arg in ("ln", "lngn")
gn_k.PREFER_PALLAS = arg in ("gn", "lngn")

import bench
from mikudance_tpu.core.configs import ContextConfig, PipelineConfig
from mikudance_tpu.diffusion.ddim import inference_step_pairs
from mikudance_tpu.pipelines import context as ctx_sched
from mikudance_tpu.pipelines.video import (VideoPipeline,
                                           build_condition_stack,
                                           guidance_context_for_windows)

STEPS = 4
bundle = bench.build_bundle()
cfg = PipelineConfig(width=bench.W, height=bench.H, num_inference_steps=STEPS,
                     guidance_scale=3.5, context=ContextConfig(frames=30, overlap=8))
pipe = VideoPipeline(bundle, cfg)
rng = np.random.default_rng(0)
T, H, W, h, w = bench.T, bench.H, bench.W, bench.h, bench.w
inputs = bench.make_inputs(T, rng)

all_frames = jnp.concatenate(
    [jnp.asarray(inputs[0], jnp.float32)[None] / 127.5 - 1.0,
     jnp.asarray(inputs[1], jnp.float32)[None] / 255.0,
     jnp.asarray(inputs[2], jnp.float32) / 255.0,
     jnp.asarray(inputs[3], jnp.float32) / 255.0,
     jnp.asarray(inputs[4], jnp.float32) / 255.0], 0)
lat = pipe._encode_jit(bundle.vae_enc_params, all_frames, mesh=None)
ref_l, skel_l = lat[0:1], lat[1:2]
cond20 = build_condition_stack(ref_l, skel_l, lat[2:2+T], lat[2+T:2+2*T], lat[2+2*T:])
windows = ctx_sched.window_matrix(T, cfg.context.frames, cfg.context.stride,
                                  cfg.context.overlap)
counts = jnp.asarray(ctx_sched.frame_counts(windows, T), jnp.float32)
flat = windows.reshape(-1)
ctx_cond = jnp.asarray(inputs[6])
g_ctx = guidance_context_for_windows(
    windows, ctx_cond, jnp.zeros_like(ctx_cond), cfg.guidance_clip_mode
).astype(bundle.guide.dtype)
banks = pipe._banks_jit(
    bundle.guide_params, cond20[flat].astype(bundle.guide.dtype),
    jnp.asarray(inputs[5])[flat].astype(bundle.guide.dtype), g_ctx, mesh=None)
ts, prev_ts = inference_step_pairs(pipe.schedule, STEPS)


def run():
    out = pipe._denoise_jit(
        bundle.den_params, jnp.asarray(inputs[7]), banks, ctx_cond,
        jnp.asarray(windows), counts, jnp.asarray(ts), jnp.asarray(prev_ts),
        jnp.float32(3.5), num_windows=windows.shape[0],
        window_len=windows.shape[1], mesh=None)
    out.block_until_ready()
    return out


out0 = run()  # compile + warmup
print(f"finite={bool(jnp.isfinite(out0).all())}", flush=True)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    run()
    times.append(time.perf_counter() - t0)
print(f"DENOISE_SECONDS {arg} min {min(times):.3f} median {sorted(times)[1]:.3f}")
