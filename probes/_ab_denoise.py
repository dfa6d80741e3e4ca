"""A/B the denoise program only: TRANSPOSED_FULLC on/off (arg: on|off),
4 steps, headline geometry. Prints DENOISE_SECONDS."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# MD_COMPILER_OPTIONS: JSON dict of XLA compiler options injected into every
# jax.jit — unlike XLA_FLAGS (parsed by the LOCAL client, which does not know
# the TPU backend's flags), these ride the ExecutableBuildOptions to the
# remote axon compiler. Used by probes/_flag_sweep.py.
import json as _json
import os as _os

_OPTS = _json.loads(_os.environ.get("MD_COMPILER_OPTIONS", "null"))
if _OPTS:
    _orig_jit = jax.jit

    def _jit(*a, **kw):
        kw.setdefault("compiler_options", _OPTS)
        return _orig_jit(*a, **kw)

    jax.jit = _jit

from mikudance_tpu.kernels import flash_attention as fa

# arg grammar: "on"/"off" toggles TRANSPOSED_FULLC; "nodense2d" suffix
# (e.g. "on-nodense2d") also disables the dense_2d flattening.
arg = sys.argv[1]
fa.TRANSPOSED_FULLC = arg.startswith("on")
if "nodense2d" in arg:
    from mikudance_tpu.models import layers as _layers

    _layers.DENSE_2D = False

import bench
from mikudance_tpu.core.configs import ContextConfig, PipelineConfig
from mikudance_tpu.pipelines.video import VideoPipeline
from mikudance_tpu.pipelines import context as ctx_sched
from mikudance_tpu.pipelines.video import (
    build_condition_stack, guidance_context_for_windows)
from mikudance_tpu.diffusion.ddim import inference_step_pairs

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

run()  # compile + warmup
times = []
for _ in range(3):
    t0 = time.perf_counter()
    run()
    times.append(time.perf_counter() - t0)
print(f"DENOISE_SECONDS {sys.argv[1]} {min(times):.3f} median {sorted(times)[1]:.3f}")
