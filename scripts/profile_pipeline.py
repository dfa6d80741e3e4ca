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
        rng.uniform(-1, 1, (H, W, 3)).astype(np.float32),
        rng.uniform(0, 1, (H, W, 3)).astype(np.float32),
        rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32),
        np.zeros((T, H, W, 3), np.float32),
        np.zeros((T, H, W, 3), np.float32),
        np.zeros((T, h, w, 2), np.float32),
        rng.normal(0, 1, (1, 257, 768)).astype(np.float32),
        rng.normal(0, 1, (T, h, w, 4)).astype(np.float32),
    )

    np.asarray(pipe(*inputs))  # warmup/compile
    t0 = time.perf_counter()
    np.asarray(pipe(*inputs))
    print(f"steady-state: {time.perf_counter() - t0:.2f}s for {args.steps} steps")

    with trace(args.logdir):
        np.asarray(pipe(*inputs))

    for t, name in op_profile_summary(args.logdir, top=args.top):
        print(f"{t:14.1f}  {name}")


if __name__ == "__main__":
    main()
