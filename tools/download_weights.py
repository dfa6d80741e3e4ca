"""Pretrained-weight fetcher (HF hub), mirroring the reference's checkpoint
set (`/root/reference/tools/download_weights.py:6-104`): SD1.5 UNet donor,
sd-image-variations image encoder, sd-vae-ft-mse, the Latte-1 temporal VAE
decoder, and the released MikuDance checkpoints (JiaxuZ/MikuDance *-60000.pth).

Usage: python tools/download_weights.py [--only base|image_encoder|vae|temporal_vae|mikudance]
"""

import argparse
import os
from pathlib import Path, PurePosixPath

ROOT = "./pretrained_weights"

SPECS = {
    "base": ("runwayml/stable-diffusion-v1-5", "stable-diffusion-v1-5",
             ["unet/config.json", "unet/diffusion_pytorch_model.bin"]),
    "image_encoder": ("lambdalabs/sd-image-variations-diffusers", ".",
                      ["image_encoder/config.json", "image_encoder/pytorch_model.bin"]),
    "vae": ("stabilityai/sd-vae-ft-mse", "sd-vae-ft-mse",
            ["config.json", "diffusion_pytorch_model.bin"]),
    "temporal_vae": ("maxin-cn/Latte-1", "vae_temporal_decoder",
                     ["vae_temporal_decoder/config.json",
                      "vae_temporal_decoder/diffusion_pytorch_model.safetensors"]),
    "mikudance": ("JiaxuZ/MikuDance", ".",
                  ["denoising_unet-60000.pth", "reference_unet-60000.pth",
                   "motion_module-60000.pth"]),
    # CLIP ViT-B/32 text tower + tokenizer files: UniPose embeds the
    # instance/keypoint vocabulary with it (reference unipose.py:122-124).
    "clip_text": ("openai/clip-vit-base-patch32", "clip-vit-base-patch32",
                  ["config.json", "pytorch_model.bin", "vocab.json",
                   "merges.txt", "tokenizer_config.json",
                   "special_tokens_map.json"]),
    # DPT-hybrid-MiDaS depth (tools/depth_from_image.py; Flax model in
    # toolbox/dpt.py, reference depth tool uses the same checkpoint).
    "dpt": ("Intel/dpt-hybrid-midas", "dpt-hybrid-midas",
            ["config.json", "pytorch_model.bin", "preprocessor_config.json"]),
}

# The UniPose detector checkpoint is distributed via Google Drive, not HF
# (reference README.md:148): download unipose_swint.pth from
# https://drive.google.com/file/d/13gANvGWyWApMFTAtC3ntrMgx0fOocjIa/view
# and place it at ./pretrained_weights/unipose_swint.pth.


def fetch(key):
    from huggingface_hub import hf_hub_download

    repo, sub, files = SPECS[key]
    local_dir = os.path.join(ROOT, sub) if sub != "." else ROOT
    os.makedirs(local_dir, exist_ok=True)
    for hub_file in files:
        path = Path(hub_file)
        if (Path(local_dir) / path).exists():
            continue
        print(f"downloading {repo}/{hub_file}")
        hf_hub_download(
            repo_id=repo,
            subfolder=str(PurePosixPath(path.parent)) if str(path.parent) != "." else None,
            filename=str(PurePosixPath(path.name)),
            local_dir=local_dir,
        )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--only", choices=list(SPECS), default=None)
    args = p.parse_args()
    for k in ([args.only] if args.only else SPECS):
        fetch(k)
