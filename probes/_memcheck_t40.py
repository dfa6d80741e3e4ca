"""AOT-compile the T=40 grouped denoise and report HBM, without executing."""
import json, numpy as np, jax
import bench
from mikudance_tpu.pipelines.video import VideoPipeline
import dataclasses as dc

bundle = bench.build_bundle()
from mikudance_tpu.core.configs import PipelineConfig, ContextConfig
cfg = PipelineConfig(width=bench.W, height=bench.H, num_inference_steps=bench.STEPS,
                     guidance_scale=3.5, context=ContextConfig(frames=30, overlap=8))
pipe = VideoPipeline(bundle, dc.replace(cfg, bank_mode="cached", cached_bank_positions=128))

captured = {}
orig = pipe._denoise_streamed_jit
def grab(*a, **kw):
    captured["a"], captured["kw"] = a, kw
    raise SystemExit_()
class SystemExit_(Exception): pass
pipe._denoise_streamed_jit = grab

inputs = bench.make_inputs(40, np.random.default_rng(0))
try:
    pipe(*inputs, to_host=True)
except SystemExit_:
    pass
print("captured:", {k: (getattr(v, 'shape', v)) for k, v in captured["kw"].items()})
lowered = orig.lower(*captured["a"], **captured["kw"])
compiled = lowered.compile()
ma = compiled.memory_analysis()
print("argument_size GB", ma.argument_size_in_bytes/2**30)
print("temp_size GB", ma.temp_size_in_bytes/2**30)
print("output GB", ma.output_size_in_bytes/2**30)
print("total GB", (ma.argument_size_in_bytes+ma.temp_size_in_bytes+ma.output_size_in_bytes)/2**30)
