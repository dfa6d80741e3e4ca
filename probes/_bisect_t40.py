"""Phase-bisect the T=40 cached-grouped case: banks (guidance batch 60),
grouped denoise (2 steps), decode — each blocked + marked, so the crash
log names the faulting phase."""
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mikudance_tpu.pipelines.video import VideoPipeline
from mikudance_tpu.core.configs import PipelineConfig, ContextConfig

bundle = bench.build_bundle()
cfg = PipelineConfig(
    width=bench.W, height=bench.H, num_inference_steps=2,
    guidance_scale=3.5, context=ContextConfig(frames=30, overlap=8),
    bank_mode="cached", cached_bank_positions=128,
)
pipe = VideoPipeline(bundle, cfg)
inputs = bench.make_inputs(40, np.random.default_rng(0))

print("PHASE banks: guidance batch 60", flush=True)
import mikudance_tpu.pipelines.video as V

orig_banks = pipe._banks_jit
orig_den = pipe._denoise_streamed_jit


def banks_blocked(*a, **kw):
    out = orig_banks(*a, **kw)
    jax.block_until_ready(out)
    print("PHASE banks DONE", flush=True)
    return out


def den_blocked(*a, **kw):
    print("PHASE denoise: grouped, 2 steps", flush=True)
    out = orig_den(*a, **kw)
    jax.block_until_ready(out)
    print("PHASE denoise DONE", flush=True)
    return out


pipe._banks_jit = banks_blocked
pipe._denoise_streamed_jit = den_blocked
out = pipe(*inputs, to_host=True)
print("PHASE decode DONE", out.shape, out.dtype, np.isfinite(out.astype(np.float32)).all(), flush=True)
