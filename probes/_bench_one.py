"""Run ONE bench case in isolation: headline | t40 | t160.

Usage: python _bench_one.py {headline|t40|t160}
Prints the case's JSON line; crashes stay isolated to this process.
"""
import dataclasses as dc
import json
import sys

import numpy as np

import bench
from mikudance_tpu.core.configs import ContextConfig, PipelineConfig
from mikudance_tpu.pipelines.video import VideoPipeline

which = sys.argv[1]
bundle = bench.build_bundle()
base = PipelineConfig(
    width=bench.W, height=bench.H, num_inference_steps=bench.STEPS,
    guidance_scale=3.5, context=ContextConfig(frames=30, overlap=8),
)
rng = np.random.default_rng(0)

if which == "headline":
    pipe = VideoPipeline(bundle, base)
    sec = bench.measure(pipe, bench.make_inputs(bench.T, rng), iters=3)
    try:
        phases, tfs, mfu = bench.phase_and_mfu(pipe, bench.make_inputs(bench.T, rng))
    except Exception as e:  # noqa: BLE001
        phases, tfs, mfu = {"error": f"{type(e).__name__}: {e}"}, None, None
    print(json.dumps({
        "metric": bench.METRIC, "value": round(sec, 3), "unit": "s",
        "vs_baseline": round(8.0 / sec, 3), "phases_s": phases,
        "denoise_tflops_per_s": round(tfs, 1) if tfs else None,
        "denoise_mfu_bf16": round(mfu, 3) if mfu else None,
    }), flush=True)
elif which == "t40":
    pipe = VideoPipeline(
        bundle, dc.replace(base, bank_mode="cached", cached_bank_positions=128))
    sec = bench.measure(pipe, bench.make_inputs(40, rng), iters=1)
    print(json.dumps({
        "metric": "sec per 40-frame 768^2 clip, 20 DDIM steps, multi-window "
                  "cached fusion (1x v5e)",
        "value": round(sec, 3), "unit": "s", "vs_baseline": None}), flush=True)
elif which == "t160":
    pipe = VideoPipeline(
        bundle, dc.replace(base, bank_mode="per_step", cached_bank_positions=30))
    sec = bench.measure(pipe, bench.make_inputs(160, rng), iters=1)
    print(json.dumps({
        "metric": "sec per 160-frame 768^2 clip, 20 DDIM steps, streamed "
                  "banks (1x v5e)",
        "value": round(sec, 3), "unit": "s", "vs_baseline": None}), flush=True)
else:
    raise SystemExit(f"unknown case {which}")
