"""Micro-bisect: run each Pallas kernel at the T=40 grouped-denoise shapes
(window_len=30, group=1 => UNet batch 30) to find which faults the worker."""
import jax
import jax.numpy as jnp
import numpy as np

from mikudance_tpu.kernels.temporal_attention import temporal_attention_btpc
from mikudance_tpu.kernels.flash_attention import flash_attention, pick_blocks

print("devices:", jax.devices(), flush=True)

# motion-module temporal attention at wf=30 (headline runs T=16)
for shape in [(1, 30, 9216, 320), (1, 30, 2304, 640), (1, 30, 576, 1280), (1, 30, 144, 1280)]:
    B, T, P, C = shape
    q = jnp.full(shape, 0.01, jnp.bfloat16)
    o = temporal_attention_btpc(q, q, q, 8)
    o.block_until_ready()
    print("btpc ok", shape, float(jnp.abs(o).max()), flush=True)

# spatial flash attention at batch 30 (headline runs batch 32)
for B, S, C in [(30, 9216, 320), (30, 2304, 640)]:
    qb, kb = pick_blocks(S)
    q = jnp.full((B, S, C), 0.01, jnp.bfloat16)
    o = flash_attention(q, q, q, 8, q_block=qb, k_block=kb)
    o.block_until_ready()
    print("flash ok", (B, S, C), float(jnp.abs(o).max()), flush=True)

print("ALL KERNELS OK", flush=True)
