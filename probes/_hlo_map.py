"""Map hot fusion names from the xprof trace to HLO shapes: compile the same
4-step denoise program (cache hit) and print the definition lines of the hot
fusions + their convolution operands."""
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import bench
from mikudance_tpu.core.configs import ContextConfig, PipelineConfig
from mikudance_tpu.pipelines.video import VideoPipeline

bundle = bench.build_bundle()
cfg = PipelineConfig(width=bench.W, height=bench.H, num_inference_steps=4,
                     guidance_scale=3.5, context=ContextConfig(frames=30, overlap=8))
pipe = VideoPipeline(bundle, cfg)

cap = {}
orig = pipe._denoise_jit


def grab(*a, **kw):
    cap["a"], cap["kw"] = a, kw
    raise SystemExit(0)


pipe._denoise_jit = grab
rng = np.random.default_rng(0)
inputs = bench.make_inputs(bench.T, rng)
try:
    pipe(*inputs, decode=False)
except SystemExit:
    pass

compiled = orig.lower(*cap["a"], **cap["kw"]).compile()
txt = compiled.as_text()
print(f"HLO text: {len(txt)/1e6:.1f} MB", file=sys.stderr)

names = sys.argv[1:] or [
    "convolution_add_fusion.398", "convolution_add_fusion.400",
    "fusion.9930", "fusion.9900", "convolution_add_fusion.313",
    "convolution_add_fusion.311", "convert_reduce_fusion.489",
    "convert_reduce_fusion.559", "convert_reduce_fusion.549",
    "convolution_add_fusion.392", "convolution_add_fusion.382",
    "fusion.9628", "fusion.9833", "fusion.9736", "fusion.9700",
]
for nm in names:
    # definition site: "%name = <shape> fusion(...), kind=..., calls=comp"
    m = re.search(rf"%{re.escape(nm)} = ([^\n]*)", txt)
    if not m:
        print(f"{nm}: NOT FOUND")
        continue
    line = m.group(1)
    print(f"\n### {nm}:\n  {line[:300]}")
    cm = re.search(r"calls=([%\w.\-]+)", line)
    if cm:
        comp = cm.group(1).lstrip("%")
        cdef = re.search(
            rf"^\s*%?{re.escape(comp)} \([^\n]*\n(.*?)^\s*}}", txt,
            re.S | re.M)
        if cdef:
            body = cdef.group(1)
            for op in re.finditer(r"[^\n]*(convolution|reduce|dot)\([^\n]*", body):
                print(f"    {op.group(0).strip()[:280]}")
