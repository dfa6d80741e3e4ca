"""Measured collective volumes of the HEADLINE SPMD denoise (VERDICT r4 #3).

Lowers the real SD-width denoise program (768^2, T=16, nw=1, wf=16, bf16,
20 DDIM steps as 1-step scan for per-step counts) over an 8-device
('win' x 'frame') CPU mesh — shard_map writes its collectives explicitly, so
the StableHLO text carries every all_to_all/psum/all_gather with concrete
shapes, no TPU or compile needed. Writes probes/collective_volume.json with
per-step and per-run byte totals; README's v5e-8 projection cites these.

Run: python probes/_collective_volume.py  (CPU-only, ~1-2 min of tracing)
"""
import json
import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
sys.path.insert(0, "/root/repo")

import jax

# the axon sitecustomize pre-imports jax and force-sets jax_platforms; the
# env vars above are too late — override back (same pattern as tests/conftest)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mikudance_tpu.core import mesh as mesh_lib
from mikudance_tpu.core.configs import (ContextConfig, DenoisingUNetConfig,
                                        GuidanceUNetConfig, PipelineConfig,
                                        VAEConfig)
from mikudance_tpu.kernels import flash_attention as _fa
from mikudance_tpu.models.unet import DenoisingUNet, GuidanceUNet, bank_keys
from mikudance_tpu.models.vae import Decoder, Encoder
from mikudance_tpu.pipelines import context as ctx_sched
from mikudance_tpu.pipelines.video import ModelBundle, VideoPipeline

_fa.FORCE_XLA = True  # Pallas kernels are TPU-only; lowering runs on CPU

H = W = 768
T, STEPS = 16, 20
h, w = H // 8, W // 8

dt = jnp.bfloat16
guide = GuidanceUNet(GuidanceUNetConfig(), dtype=dt)
den = DenoisingUNet(DenoisingUNetConfig(), dtype=dt)
enc, dec = Encoder(VAEConfig()), Decoder(VAEConfig())

# Shape-only params: lowering needs shapes/dtypes, not values.
rng = jax.random.PRNGKey(0)
gp = jax.eval_shape(guide.init, rng, jnp.zeros((1, h, w, 20)),
                    jnp.zeros((1, h, w, 2)), jnp.zeros((1,), jnp.int32),
                    jnp.zeros((1, 257, 768)))
dp = jax.eval_shape(den.init, rng, jnp.zeros((1, 1, h, w, 4)),
                    jnp.zeros((1,), jnp.int32), jnp.zeros((1, 257, 768)))
ep = jax.eval_shape(enc.init, rng, jnp.zeros((1, 8, 8, 3)))
dcp = jax.eval_shape(dec.init, rng, jnp.zeros((1, 1, 1, 4)))

bundle = ModelBundle(guide, gp, den, dp, enc, ep, dec, dcp)
cfg = PipelineConfig(width=W, height=H, num_inference_steps=STEPS,
                     guidance_scale=3.5,
                     context=ContextConfig(frames=30, overlap=8))
pipe = VideoPipeline(bundle, cfg, devices=jax.devices()[:8])

windows = ctx_sched.window_matrix(T, cfg.context.frames, cfg.context.stride,
                                  cfg.context.overlap)
nw, wf = windows.shape
assert (nw, wf) == (1, T), (nw, wf)
# exactly the mesh the pipeline builds for this geometry (video.py __call__)
mesh = mesh_lib.choose_2d_mesh(jax.devices()[:8], 2 * nw, wf)
print("mesh:", dict(mesh.shape))
counts = jnp.asarray(ctx_sched.frame_counts(windows, T), jnp.float32)

S = lambda shape, d=jnp.float32: jax.ShapeDtypeStruct(shape, d)
sizes_banks = {}
ch = DenoisingUNetConfig().unet.block_out_channels
hw = h * w
lv = {"down_0": (hw, ch[0]), "down_1": (hw // 4, ch[1]),
      "down_2": (hw // 16, ch[2]), "mid": (hw // 64, ch[3]),
      "up_1": (hw // 16, ch[2]), "up_2": (hw // 4, ch[1]),
      "up_3": (hw, ch[0])}
banks = {}
for k in bank_keys(DenoisingUNetConfig().unet):
    base = "mid" if k == "mid" else k.rsplit("_", 1)[0]
    s, c = lv[base]
    banks[k] = S((nw * wf, s, c), dt)

from functools import partial

fn = jax.jit(
    partial(pipe._denoise, num_windows=nw, window_len=wf, mesh=mesh),
    static_argnames=(),
)
lowered = fn.lower(
    jax.tree.map(lambda x: S(x.shape, x.dtype), dp),
    S((T, h, w, 4)), banks, S((1, 257, 768)),
    S((nw, wf), jnp.int32), S((T,)),
    S((1,), jnp.int32), S((1,), jnp.int32), S((), jnp.float32),
)
text = lowered.as_text()

# StableHLO collectives: count ops + operand bytes. Ops inside the step scan
# body appear once in text but run once per DDIM step; with a 1-step ts the
# whole program IS one step (plus the hoisted K/V prologue).
DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "i32": 4, "ui8": 1, "i8": 1,
               "f64": 8, "i64": 8, "ui32": 4, "i1": 1}


def tensor_bytes(ty: str):
    m = re.match(r"tensor<([0-9x]*)x?([a-z0-9]+)>", ty)
    if not m:
        return 0
    dims, d = m.groups()
    n = 1
    for p in dims.split("x"):
        if p:
            n *= int(p)
    return n * DTYPE_BYTES.get(d, 4)


def scan(pattern):
    out = {"count": 0, "bytes": 0, "shapes": {}}
    for line in text.splitlines():
        if pattern in line:
            # operand types live in the trailing function-type
            # `: (tensor<...>, ...) -> tensor<...>`, NOT in the
            # replica_groups attribute (`dense<...> : tensor<NxMxi64>`)
            m = re.search(r":\s*\(([^)]*)\)\s*->", line)
            if not m:
                continue
            tys = re.findall(r"tensor<[^>]+>", m.group(1))
            if not tys:
                continue
            b = sum(tensor_bytes(t) for t in tys)
            out["count"] += 1
            out["bytes"] += b
            out["shapes"][tys[0]] = out["shapes"].get(tys[0], 0) + 1
    return out


report = {
    "geometry": {"H": H, "W": W, "T": T, "nw": nw, "wf": wf,
                 "mesh": {str(k): int(v) for k, v in mesh.shape.items()},
                 "dtype": "bf16", "steps_lowered": 1},
    "all_to_all": scan("all_to_all"),
    "all_reduce(psum)": scan("all_reduce"),
    "all_gather": scan("all_gather"),
    "collective_permute": scan("collective_permute"),
}
per_step = sum(v["bytes"] for k, v in report.items() if isinstance(v, dict)
               and "bytes" in v)
report["per_step_collective_bytes_total"] = per_step
report["per_run_bytes_at_20_steps"] = per_step * STEPS
print(json.dumps(report, indent=1))
with open("/root/repo/probes/collective_volume.json", "w") as f:
    json.dump(report, f, indent=1)
