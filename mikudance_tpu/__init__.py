"""mikudance_tpu — a TPU-native (JAX/Flax/Pallas) character-art animation framework.

Re-implements the capabilities of the MikuDance reference (SD1.5 two-UNet
reference-attention architecture with AnimateDiff temporal motion modules and
mixed-motion-dynamics conditioning) as an idiomatic JAX/XLA program:

- models:      Flax modules (guidance/reference UNet, 3D denoising UNet, VAE,
               CLIP vision tower, motion modules, MAN normalization)
- kernels:     Pallas TPU kernels for the attention hot paths
- diffusion:   zero-SNR v-prediction DDIM, min-SNR loss weighting
- pipelines:   image & video sampling loops (lax.scan over steps, batched
               sliding windows, segment-sum fusion)
- train:       pjit/shard_map data-parallel training steps (stage 1 & 2)
- core:        mesh/sharding helpers, config system, torch-checkpoint converter
"""

__version__ = "0.1.0"

# Route the model attention through the Pallas/XLA dispatcher.
from .kernels import flash_attention as _flash_attention  # noqa: E402

_flash_attention.install()
