"""Headline benchmark: 16-frame 768x768 clip, 20 DDIM steps, full pipeline.

Runs on the real TPU chip (axon default platform). Prints ONE JSON line:
{"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 8.0/seconds}

The measured span is the full serving path of `scripts/inference_video.py`'s
north star: batched VAE condition encode -> guidance banks (once, reused
across steps) -> 20-step lax.scan denoise with CFG -> chunked VAE decode.
Baseline: the driver-set target of 8 s on v5e-8 (BASELINE.json); this runs on
a single v5e chip.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from mikudance_tpu.core.configs import (  # noqa: E402
    ContextConfig,
    DenoisingUNetConfig,
    GuidanceUNetConfig,
    PipelineConfig,
)
from mikudance_tpu.core.params import cast_params  # noqa: E402
from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet  # noqa: E402
from mikudance_tpu.models.vae import Decoder, Encoder  # noqa: E402
from mikudance_tpu.pipelines.video import ModelBundle, VideoPipeline  # noqa: E402

T, H, W = 16, 768, 768
STEPS = 20
h, w = H // 8, W // 8
DTYPE = jnp.bfloat16
METRIC = "sec per 16-frame 768^2 clip, 20 DDIM steps, full pipeline (1x v5e)"


def build_bundle() -> ModelBundle:
    rng = jax.random.PRNGKey(0)
    guide = GuidanceUNet(GuidanceUNetConfig(), dtype=DTYPE)
    den = DenoisingUNet(DenoisingUNetConfig(), dtype=DTYPE)
    enc, dec = Encoder(dtype=DTYPE), Decoder(dtype=DTYPE)

    gp = cast_params(
        jax.jit(guide.init)(
            rng, jnp.zeros((1, h, w, 20), DTYPE), jnp.zeros((1, h, w, 2), DTYPE),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 257, 768), DTYPE),
        ),
        DTYPE,
    )
    dp = cast_params(
        jax.jit(den.init)(
            rng, jnp.zeros((1, 1, h, w, 4), DTYPE), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 257, 768), DTYPE),
        ),
        DTYPE,
    )
    ep = cast_params(jax.jit(enc.init)(rng, jnp.zeros((1, H, W, 3), DTYPE)), DTYPE)
    dcp = cast_params(jax.jit(dec.init)(rng, jnp.zeros((1, h, w, 4), DTYPE)), DTYPE)
    return ModelBundle(guide, gp, den, dp, enc, ep, dec, dcp)


PEAK_BF16_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v4": 275.0,
                    "TPU v6 lite": 918.0, "TPU v6e": 918.0}


def make_inputs(T, rng):
    # image streams ship as uint8 and normalize on device (to_unit_float):
    # the serving path's frames are uint8 media anyway, and fp32 H2D transfer
    # cost 9.3 s of the round-1 35.5 s run.
    return (
        rng.integers(0, 256, (H, W, 3), dtype=np.uint8),
        rng.integers(0, 256, (H, W, 3), dtype=np.uint8),
        rng.integers(0, 256, (T, H, W, 3), dtype=np.uint8),
        np.zeros((T, H, W, 3), np.uint8),
        np.zeros((T, H, W, 3), np.uint8),
        np.zeros((T, h, w, 2), np.float32),
        rng.normal(0, 1, (1, 257, 768)).astype(np.float32),
        rng.normal(0, 1, (T, h, w, 4)).astype(np.float32),
    )


def denoise_flops(pipe) -> float:
    """XLA-counted FLOPs of the captured denoise program (one full scan)."""
    cap = {}
    orig = pipe._denoise_jit, pipe._denoise_streamed_jit

    def grab_cached(*a, **kw):
        cap["args"], cap["kw"], cap["which"] = a, kw, 0
        return orig[0](*a, **kw)

    def grab_streamed(*a, **kw):
        cap["args"], cap["kw"], cap["which"] = a, kw, 1
        return orig[1](*a, **kw)

    return grab_cached, grab_streamed, cap, orig


def measure(pipe, inputs, iters=3):
    def run():
        # to_host=True: decode chunks pipeline their D2H copies under the next
        # chunk's compute (the serial fetch left the slow link idle)
        video = pipe(*inputs, to_host=True)
        return np.asarray(video)  # already host-side; asarray is a no-op

    out = run()  # warmup / compile
    assert np.isfinite(out).all()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def pallas_attention_flops(T_frames: int, steps: int) -> float:
    """FLOPs of the denoise scan's Pallas attention custom calls — XLA's
    cost_analysis does not see inside custom calls, so these are added
    analytically. Mirrors the kernel dispatch (`kernels.flash_attention`):
    self-attention runs Pallas at the >=1024-token UNet levels (9216 and 2304
    at 768^2); the 576/144-token levels, cross-attention (257 CLIP tokens)
    and the guidance UNet outside the scan are XLA ops cost_analysis counts.
    The motion modules' temporal kernel is counted too (small)."""
    from mikudance_tpu.kernels.flash_attention import _use_flash
    from mikudance_tpu.pipelines import context as ctx_sched

    cfg_ch = (320, 640, 1280, 1280)
    heads_levels = [(h * w, cfg_ch[0]), (h * w // 4, cfg_ch[1]),
                    (h * w // 16, cfg_ch[2])]
    windows = ctx_sched.window_matrix(T_frames, 30, 1, 8)
    nw, wf = windows.shape
    B = 2 * nw * wf  # CFG x windows x frames, frame-folded
    per_step = 0.0
    for S, C in heads_levels:
        if _use_flash(S, S):
            n_layers = 5  # 2 down + 3 up at each attention level
            per_step += n_layers * 4.0 * B * S * S * C
    # temporal attention (B=2nw, P positions, T=wf frames) at every level
    # incl. mid: layers x 4*B*P*T^2*C
    for S, C, n in [(h * w, cfg_ch[0], 10), (h * w // 4, cfg_ch[1], 10),
                    (h * w // 16, cfg_ch[2], 10), (h * w // 64, cfg_ch[3], 7)]:
        per_step += n * 4.0 * (2 * nw) * S * wf * wf * C
    return per_step * steps


def phase_and_mfu(pipe, inputs, repeats=3):
    """Instrumented passes: per-phase seconds (MEDIANS over ``repeats``) +
    denoise MFU. FLOPs = the XLA-counted FLOPs of the exact compiled denoise
    program + the analytic FLOPs of its Pallas attention custom calls
    (invisible to cost_analysis).

    Round-3 lesson (committed bench_results.json said "vae_encode": 10.209 s
    while the true encode is ~1.0 s): each phase boundary syncs via a scalar
    fetch whose tiny astype+sum programs COMPILE on first use — through the
    axon tunnel that compile costs ~5-10 s and lands in whatever phase hits
    it first. So the FIRST instrumented pass is a warmup (discarded) and the
    reported numbers are medians of the following ``repeats`` passes. The
    caller cross-checks Σphases against the clean end-to-end median."""
    from mikudance_tpu.utils.profiling import Timer

    grab_cached, grab_streamed, cap, orig = denoise_flops(pipe)
    pipe._denoise_jit, pipe._denoise_streamed_jit = grab_cached, grab_streamed
    try:
        samples = []
        for it in range(repeats + 1):
            t = Timer()
            np.asarray(pipe(*inputs, to_host=True, timer=t))
            if it > 0:  # pass 0 compiles the phase-sync programs
                samples.append(t.phases)
        timer = Timer()
        timer.phases = {
            k: float(np.median([s[k] for s in samples]))
            for k in samples[0]
        }
    finally:
        pipe._denoise_jit, pipe._denoise_streamed_jit = orig

    mfu = tfs = None
    den_key = "denoise" if "denoise" in timer.phases else "denoise_streamed"
    try:
        jf = orig[cap["which"]]
        cost = jf.lower(*cap["args"], **cap["kw"]).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
        T_frames = inputs[2].shape[0]
        flops += pallas_attention_flops(T_frames, pipe.config.num_inference_steps)
        dk = jax.devices()[0].device_kind
        peak = PEAK_BF16_TFLOPS.get(dk)
        dt = timer.phases.get(den_key)
        if flops and dt:
            tfs = flops / dt / 1e12
            mfu = tfs / peak if peak else None
    except Exception:
        pass
    phases = {k: round(v, 3) for k, v in timer.phases.items()}
    return phases, tfs, mfu


def main():
    bundle = build_bundle()

    def build_pipe(steps=STEPS):
        cfg = PipelineConfig(
            width=W, height=H, num_inference_steps=steps, guidance_scale=3.5,
            context=ContextConfig(frames=30, overlap=8),
        )
        return VideoPipeline(bundle, cfg)

    rng = np.random.default_rng(0)
    results = []

    # --- headline FIRST (nothing may jeopardize it), printed LAST (the
    # driver parses the final JSON line) ---
    pipe = build_pipe()
    inputs = make_inputs(T, rng)
    sec = measure(pipe, inputs, iters=3)
    try:
        phases, tfs, mfu = phase_and_mfu(pipe, inputs)
    except Exception as e:
        phases, tfs, mfu = {"error": f"{type(e).__name__}: {e}"}, None, None
    phase_sum = sum(v for v in phases.values() if isinstance(v, float))
    # self-consistency GATE (round-3 lesson): the phase medians must roughly
    # reassemble the clean end-to-end median, else the breakdown is
    # instrumentation noise — in that case the breakdown is NOT quoted
    # (phases_s nulled, raw values parked under phases_raw_s for debugging).
    consistent = bool(abs(phase_sum - sec) <= 0.15 * sec)
    headline = {
        "metric": METRIC,
        "value": round(sec, 3),
        "unit": "s",
        "vs_baseline": round(8.0 / sec, 3),
        "phases_s": phases if consistent else None,
        "phases_sum_s": round(phase_sum, 3),
        "phases_consistent": consistent,
        **({} if consistent else {"phases_raw_s": phases}),
        "denoise_tflops_per_s": round(tfs, 1) if tfs else None,
        "denoise_mfu_bf16": round(mfu, 3) if mfu else None,
    }
    # safety print: if a secondary bench hard-crashes the TPU worker, the
    # last JSON line on stdout is still the (already measured) headline
    print(json.dumps(headline), flush=True)
    import gc

    del inputs
    gc.collect()
    jax.clear_caches()  # free the headline programs' HBM before secondaries
    gc.collect()

    # --- secondary cases. Each builds its pipeline, runs, then drops every
    # reference + clears jit executable caches: later cases otherwise OOM on
    # the leftovers of earlier ones (measured round 4: the q8 T=160 case —
    # which fits a fresh process with GBs to spare — RESOURCE_EXHAUSTED when
    # run after the headline + T=40 cases in one process). The memory-
    # heaviest case runs first for the same reason.
    import dataclasses as _dc
    import gc as _gc

    def secondary(metric, fn):
        try:
            results.append({"metric": metric, "value": round(fn(), 3),
                            "unit": "s", "vs_baseline": None})
        except Exception as e:
            results.append({"metric": metric,
                            "error": f"{type(e).__name__}: {e}"})
        _gc.collect()
        jax.clear_caches()  # drop device executables (persistent cache
        # makes the recompiles cheap); frees their HBM reservations
        _gc.collect()

    # --- long video. cached_q8 deduplicates banks by (frame, CLIP variant)
    # and caches ALL of them as int8 (+fp32 scales), so no guidance-UNet
    # recompute happens inside the step scan — beating the reference's
    # per-(step, window) recompute (453.6 s per_step in round 3 = the
    # reference's own memory behavior; q8 measured 347.8 s round 4).
    # Quality gate: tests/test_bank_streaming.py::test_cached_q8_matches_exact.
    def q8_case():
        pipe_q8 = VideoPipeline(
            bundle,
            _dc.replace(pipe.config, bank_mode="cached_q8",
                        cached_bank_positions=30),
        )
        return measure(pipe_q8, make_inputs(160, rng), iters=1)

    secondary(
        "sec per 160-frame 768^2 clip, 20 DDIM steps, int8 full bank cache "
        "(1x v5e)",
        q8_case,
    )

    # T=40 -> 2 windows of 30 (the smallest multi-window case): all banks
    # cached + both windows denoised in one batch. T=64 (3 windows, a 180-
    # frame UNet batch + 4.7 GB of banks) exceeds one chip's 16 GB.
    def cached_case():
        pipe_cached = VideoPipeline(
            bundle,
            _dc.replace(pipe.config, bank_mode="cached",
                        cached_bank_positions=128),
        )
        return measure(pipe_cached, make_inputs(40, rng), iters=1)

    secondary(
        "sec per 40-frame 768^2 clip, 20 DDIM steps, multi-window cached "
        "fusion (1x v5e)",
        cached_case,
    )

    # --- secondary: XPose/UniPose keypoint extraction at the video driver's
    # geometry (10-frame batches, 900 queries — the reference's
    # get_unipose_output_batch processes 10 frames per forward). Random
    # weights (parity vs the torch reference is proven separately in
    # tests/test_unipose_parity.py); fp32, as the tool wrapper runs it.
    def xpose_case():
        from mikudance_tpu.toolbox.unipose import UniPose

        model = UniPose()
        rng2 = jax.random.PRNGKey(0)
        B, Hx, Wx = 10, 800, 800
        img = jnp.asarray(rng.normal(0, 1, (B, Hx, Wx, 3)).astype(np.float32))
        obj = jnp.asarray(rng.normal(0, 1, (B, 4, 512)).astype(np.float32))
        msk = jnp.ones((B, 4), bool)
        kpt = jnp.asarray(rng.normal(0, 1, (B, 68, 512)).astype(np.float32))
        vis = jnp.ones((B, 68), np.float32)
        from mikudance_tpu.utils.profiling import force

        params = jax.jit(model.init)(rng2, img[:1], obj[:1], msk[:1],
                                     kpt[:1], vis[:1])
        fwd = jax.jit(model.apply)
        force(fwd(params, img, obj, msk, kpt, vis))  # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(fwd(params, img, obj, msk, kpt, vis))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    secondary(
        "sec per 10-frame UniPose-SwinT keypoint forward (800^2, 900 queries,"
        " 1x v5e)",
        xpose_case,
    )

    results.append(headline)
    with open("bench_results.json", "w") as f:
        json.dump(results, f, indent=1)
    for r in results[:-1]:
        print(json.dumps(r))
    print(json.dumps(headline))  # headline LAST: the driver parses this line


def _emit_stale_fallback(reason: str):
    """Last resort: surface the most recent committed headline, marked stale.

    Round 3's lesson: a one-shot probe + exit left BENCH_r03.json holding an
    error instead of ANY number. If the tunnel never recovers, re-emit the
    last good ``bench_results.json`` headline with ``"stale": true`` so the
    record distinguishes "never measured" from "measured last round, tunnel
    down today"."""
    try:
        with open("bench_results.json") as f:
            prior = json.load(f)
        headline = next(r for r in reversed(prior) if r.get("metric") == METRIC
                        and "value" in r)
        headline = dict(headline)
        headline["stale"] = True
        headline["error"] = reason
        print(json.dumps(headline), flush=True)
    except Exception:
        print(json.dumps({"metric": METRIC, "error": reason}), flush=True)


def _require_device(probe_every_s: float = 60.0, give_up_s: float = 1200.0):
    """Wait (loudly) for the TPU tunnel, retrying instead of one-shot failing.

    The axon pool occasionally goes down; ``jax.devices()`` then blocks
    FOREVER inside PJRT client init (observed 2026-08-17: hours). Round 3's
    one-shot 300 s probe turned a *flaky-but-recovering* tunnel into an empty
    BENCH file — so now we re-probe every ``probe_every_s`` for up to
    ``give_up_s`` (the probe thread blocks once; we poll its completion),
    and only after ~20 min emit the stale-marked last-good headline and exit.
    """
    import os
    import threading

    done = threading.Event()

    def probe():
        try:
            jax.devices()
        finally:
            done.set()

    threading.Thread(target=probe, daemon=True).start()
    waited = 0.0
    while waited < give_up_s:
        if done.wait(probe_every_s):
            return
        waited += probe_every_s
        print(f"# TPU backend not up after {waited:.0f}s; retrying "
              f"(give up at {give_up_s:.0f}s)", flush=True)
    _emit_stale_fallback(
        f"TPU backend init did not complete in {give_up_s:.0f}s "
        "(axon tunnel down?) — re-emitting last committed measurement as stale"
    )
    os._exit(3)


if __name__ == "__main__":
    _require_device()
    main()
