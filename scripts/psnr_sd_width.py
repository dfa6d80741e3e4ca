"""SD-width end-to-end PSNR gate, executed on the real TPU chip.

Closes VERDICT r3 weak #4: the full-pipeline PSNR proof previously ran only
at toy widths (tests/test_e2e_psnr.py, 32-96 channels at 128^2); a
composition bug that only manifests at SD widths/resolutions (e.g. a
head-count/dim interaction in the flash-kernel dispatch at 9216 tokens)
would have slipped through. This script runs the SAME pipeline-vs-torch-
oracle composition with the real SD1.5 UNet geometry — (320, 640, 1280,
1280) channels, 8 heads, 768^2 images (9216-token attention), motion
modules, MAN — for 2 DDIM steps, JAX on the TPU vs the all-torch oracle on
the host CPU, and writes the measured PSNR to ``PSNR_SD.json``.

The VAE twin stays the parity-proven tiny one (resolution-correct at 768^2;
real-width VAE parity is covered per-module by tests/test_vae_parity.py and
tests/test_sd_width_parity.py) — the blind spot being closed is the UNet
width/resolution composition, and tiny VAE keeps the single-core torch
oracle affordable.

Usage: python scripts/psnr_sd_width.py   (~20-40 min, mostly torch-on-CPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests")
)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# fp32 parity on TPU needs true-fp32 matmuls (6-pass bf16 decomposition).
# Applied for the fp32 gate only — the bf16 (serving-dtype) gate must run
# exactly what production runs (set in main after arg parsing).
if "bf16" not in sys.argv:
    jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import torch

from mikudance_tpu.core.configs import UNetConfig


def main():
    import argparse

    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2,
                    help="DDIM steps (2 = round-4 gate; 4-6 = the multi-step "
                         "error-accumulation gate)")
    ap.add_argument("--dtype", choices=("fp32", "bf16"), default="fp32",
                    help="UNet compute dtype on TPU (fp32 uses 'highest' "
                         "matmul precision; bf16 is the serving dtype)")
    ap.add_argument("--out", default=None,
                    help="output JSON (default: PSNR_SD.json for the 2-step "
                         "fp32 gate, PSNR_SD_multistep.json otherwise)")
    args = ap.parse_args()
    default_case = args.steps == 2 and args.dtype == "fp32"
    out_path = args.out or ("PSNR_SD.json" if default_case
                            else "PSNR_SD_multistep.json")

    from test_e2e_psnr import TINY_VAE, run_pipeline_vs_oracle
    from test_torch_parity import TUNet
    from test_vae_parity import TAutoencoderKL

    sd = UNetConfig()  # SD1.5 defaults: (320, 640, 1280, 1280), 8 heads
    assert sd.block_out_channels == (320, 640, 1280, 1280)

    torch.manual_seed(3)
    print("building SD-width torch twins...", flush=True)
    tvae = TAutoencoderKL().eval()
    ch = sd.block_out_channels
    tguide = TUNet(ch, 2, 8, 768, in_ch=20, man=True).eval()
    tden = TUNet(ch, 2, 8, 768, in_ch=4, motion=True).eval()
    for name, p in tden.named_parameters():
        if "proj_out" in name and "temporal_transformer" in name:
            torch.nn.init.normal_(p, std=0.05)

    t0 = time.time()
    got_video, want_video, got_lat, want_lat = run_pipeline_vs_oracle(
        tvae, tguide, tden, unet_cfg=sd, vae_cfg=TINY_VAE, motion_heads=8,
        T=2, H=768, W=768, steps=args.steps, s_ctx=257, ctx_frames=3,
        overlap=1,
        unet_dtype=jnp.bfloat16 if args.dtype == "bf16" else None,
    )
    elapsed = time.time() - t0

    lat_err = float(np.max(np.abs(got_lat - want_lat.transpose(0, 2, 3, 1))))
    diff = (got_video.astype(np.float64) - want_video.astype(np.float64)) / 255.0
    mse = float(np.mean(diff**2))
    psnr = float(10 * np.log10(1.0 / mse)) if mse > 0 else float("inf")

    prec = ("TPU fp32-highest" if args.dtype == "fp32"
            else "TPU bf16 (serving dtype)")
    record = {
        "metric": f"SD-width e2e PSNR vs torch oracle (768^2, 2 frames, "
                  f"{args.steps} DDIM steps, SD1.5 UNet geometry, {prec})",
        "psnr_db": round(psnr, 1),
        "latent_max_abs_err": lat_err,
        "bar_db": 35.0,
        "pass": bool(psnr >= 35.0),
        "elapsed_s": round(elapsed, 1),
        "device": str(jax.devices()[0]),
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    assert psnr >= 35.0, f"SD-width PSNR {psnr:.1f} dB below the 35 dB bar"


if __name__ == "__main__":
    main()
