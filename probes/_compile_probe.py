"""Fresh-compile probe at tiny geometry (192^2, T=4, 2 steps): times the
_denoise compile under the MD_HOIST_BANK_KV / MD_HOIST_CTX_KV toggles to
bisect the round-4 TPU compile-time blowup (701 s with both hoists on)."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mikudance_tpu.core.configs import (ContextConfig, DenoisingUNetConfig,
                                        GuidanceUNetConfig, PipelineConfig)
from mikudance_tpu.core.params import cast_params
from mikudance_tpu.diffusion.ddim import inference_step_pairs
from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet
from mikudance_tpu.models.vae import Decoder, Encoder
from mikudance_tpu.pipelines import context as ctx_sched
from mikudance_tpu.pipelines import video as video_mod
from mikudance_tpu.pipelines.video import (ModelBundle, VideoPipeline,
                                           guidance_context_for_windows)

print("HOIST flags:", getattr(video_mod, "HOIST_BANK_KV", "n/a"), getattr(video_mod, "HOIST_CTX_KV", "n/a"), flush=True)
DT = jnp.bfloat16
H = W = 192
h = w = H // 8
T = 4
rng = jax.random.PRNGKey(0)
guide = GuidanceUNet(GuidanceUNetConfig(), dtype=DT)
den = DenoisingUNet(DenoisingUNetConfig(), dtype=DT)
enc, dec = Encoder(dtype=DT), Decoder(dtype=DT)
print("init...", flush=True)
gp = cast_params(jax.jit(guide.init)(
    rng, jnp.zeros((1, h, w, 20), DT), jnp.zeros((1, h, w, 2), DT),
    jnp.zeros((1,), jnp.int32), jnp.zeros((1, 257, 768), DT)), DT)
dp = cast_params(jax.jit(den.init)(
    rng, jnp.zeros((1, 1, h, w, 4), DT), jnp.zeros((1,), jnp.int32),
    jnp.zeros((1, 257, 768), DT)), DT)
ep = cast_params(jax.jit(enc.init)(rng, jnp.zeros((1, H, W, 3), DT)), DT)
dcp = cast_params(jax.jit(dec.init)(rng, jnp.zeros((1, h, w, 4), DT)), DT)
bundle = ModelBundle(guide, gp, den, dp, enc, ep, dec, dcp)
cfg = PipelineConfig(width=W, height=H, num_inference_steps=2,
                     guidance_scale=3.5,
                     context=ContextConfig(frames=30, overlap=8))
pipe = VideoPipeline(bundle, cfg)
nprng = np.random.default_rng(0)
windows = ctx_sched.window_matrix(T, 30, 1, 8)
counts = jnp.asarray(ctx_sched.frame_counts(windows, T), jnp.float32)
flat = windows.reshape(-1)
ctx_cond = jnp.asarray(nprng.normal(0, 1, (1, 257, 768)).astype(np.float32))
g_ctx = guidance_context_for_windows(
    windows, ctx_cond, jnp.zeros_like(ctx_cond), cfg.guidance_clip_mode
).astype(DT)
cond20 = jnp.asarray(nprng.normal(0, 1, (T, h, w, 20)).astype(np.float32))
mot = jnp.asarray(np.zeros((T, h, w, 2), np.float32))
banks = pipe._banks_jit(gp, cond20[flat].astype(DT), mot[flat].astype(DT),
                        g_ctx, mesh=None)
jax.block_until_ready(banks)
print("banks ok", flush=True)
ts, prev_ts = inference_step_pairs(pipe.schedule, 2)
noise = jnp.asarray(nprng.normal(0, 1, (T, h, w, 4)).astype(np.float32))
print("denoise compile...", flush=True)
t0 = time.time()
out = pipe._denoise_jit(dp, noise, banks, ctx_cond, jnp.asarray(windows),
                        counts, jnp.asarray(ts), jnp.asarray(prev_ts),
                        jnp.float32(3.5), num_windows=windows.shape[0],
                        window_len=windows.shape[1], mesh=None)
out.block_until_ready()
print(f"denoise compile+run {time.time()-t0:.1f}s "
      f"finite={bool(jnp.isfinite(out).all())}", flush=True)
