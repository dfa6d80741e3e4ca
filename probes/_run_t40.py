import time, numpy as np, dataclasses as dc
import bench
from mikudance_tpu.pipelines.video import VideoPipeline
from mikudance_tpu.core.configs import PipelineConfig, ContextConfig

bundle = bench.build_bundle()
cfg = PipelineConfig(width=bench.W, height=bench.H, num_inference_steps=bench.STEPS,
                     guidance_scale=3.5, context=ContextConfig(frames=30, overlap=8))
pipe = VideoPipeline(bundle, dc.replace(cfg, bank_mode="cached", cached_bank_positions=128))
inputs = bench.make_inputs(40, np.random.default_rng(0))
sec = bench.measure(pipe, inputs, iters=1)
print("T40_SECONDS", sec)
