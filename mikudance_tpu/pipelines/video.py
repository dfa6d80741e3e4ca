"""MikuDance video sampling pipeline, TPU-native.

Rebuilds ``MikuDanceVideoPipeline.__call__``
(`/root/reference/src/pipelines/pipeline_mikudance.py:362-704`) as a small set
of jitted pure functions:

- All condition frames are VAE-encoded in ONE batched call (the reference
  loops frame-at-a-time in Python, `:483-549`).
- Reference-attention banks depend only on the 22-ch condition stack and
  t=0, never on the denoising state — so they are computed ONCE per
  (window, position) and reused across all DDIM steps (the reference
  recomputes them every step x window, `:646-653`; bit-identical result,
  ~steps x less guidance-UNet work).
- The denoising loop is one ``lax.scan`` over timesteps. All sliding windows
  are denoised as one batched call (window axis folded into batch) with CFG
  folded in as well (first half uncond with zero banks — equivalent to the
  reference's uc_mask plain-self-attention bypass, mutual_mix_attention.py:181-201).
- Overlap fusion ("counter" accumulation, `:577-664`) is a segment-sum.

CFG-embed parity: the reference tiles the [uncond, cond] CLIP pair f times for
the guidance UNet (`:646`), so window position k receives the *uncond* embed
when (f+k) is even. ``guidance_clip_mode="reference_inference"`` replicates
this; ``"cond"`` gives every frame the cond embed (the training-time behavior,
`train_stage2.py` Net.forward).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # moved between jax versions
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core import mesh as mesh_lib
from ..core.compile_opts import tuned_jit
from ..core.configs import PipelineConfig
from ..diffusion.ddim import DDIMSchedule, inference_step_pairs
from ..models.unet import (DenoisingUNet, GuidanceUNet, bank_keys,
                           precompute_context_kv, precompute_reference_kv)
from ..models.vae import Decoder, Encoder, latent_mean
from . import context as ctx_sched
from . import interpolation

SD_LATENT_SCALE = 0.18215

# Step-invariant K/V hoisting toggles (A/B + compile-time bisection knobs):
# project the reference banks / CLIP context through the reader blocks'
# K/V kernels ONCE per clip instead of inside every denoise step.
import os as _os

HOIST_BANK_KV = _os.environ.get("MD_HOIST_BANK_KV", "1") == "1"
HOIST_CTX_KV = _os.environ.get("MD_HOIST_CTX_KV", "1") == "1"


@dataclasses.dataclass
class ModelBundle:
    """Module definitions + parameter trees for the five networks."""

    guide: GuidanceUNet
    guide_params: Any
    den: DenoisingUNet
    den_params: Any
    vae_enc: Encoder
    vae_enc_params: Any
    vae_dec: Decoder
    vae_dec_params: Any
    clip: Any = None  # CLIPVisionTower
    clip_params: Any = None


_SHARD_SPEC = P((mesh_lib.WIN_AXIS, mesh_lib.FRAME_AXIS))  # 1-D over all devices


def _pad_leading(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x


def _encode_chunked(vae_enc: Encoder, params, frames: jnp.ndarray, chunk: int):
    N = frames.shape[0]
    chunk = min(chunk, N)
    pad = (-N) % chunk
    fr = _pad_leading(frames, pad)
    fr = fr.reshape((-1, chunk) + frames.shape[1:])
    lats = jax.lax.map(lambda f: latent_mean(vae_enc.apply(params, f)), fr)
    return lats.reshape((-1,) + lats.shape[2:])[:N]


def encode_frames(
    vae_enc: Encoder, params, frames: jnp.ndarray, chunk: int = 8,
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """VAE-encode frames (N, H, W, 3) -> scaled latent means, streamed in
    chunks via ``lax.map`` (full-res encoder activations are huge: one 768^2
    frame keeps ~1.5 GB of bf16 activations live, so N frames at once would
    not fit HBM; the reference streams frame-at-a-time in Python,
    `pipeline_mikudance.py:483-549` — here it is a compiled loop). With a mesh,
    frames are embarrassingly parallel: shard_map over the device grid, each
    device streaming its own frame slice."""
    if mesh is None:
        return _encode_chunked(vae_enc, params, frames, chunk) * SD_LATENT_SCALE
    n = mesh.devices.size
    N = frames.shape[0]
    fr = _pad_leading(frames, (-N) % n)
    local = shard_map(
        lambda p, f: _encode_chunked(vae_enc, p, f, chunk),
        mesh=mesh, in_specs=(P(), _SHARD_SPEC), out_specs=_SHARD_SPEC,
       
    )
    return local(params, fr)[:N] * SD_LATENT_SCALE


def _decode_chunked(vae_dec, dec_params, latents: jnp.ndarray) -> jnp.ndarray:
    chunk = getattr(vae_dec, "decode_chunk", 4)
    N = latents.shape[0]
    c = min(chunk, N)
    n_full = N // c

    def dec(zz):
        return vae_dec.apply(dec_params, zz / SD_LATENT_SCALE)

    z_full = latents[: n_full * c].reshape((n_full, c) + latents.shape[1:])
    imgs = jax.lax.map(dec, z_full)
    imgs = imgs.reshape((-1,) + imgs.shape[2:])
    if N - n_full * c:
        imgs = jnp.concatenate([imgs, dec(latents[n_full * c :])], axis=0)
    return imgs


def decode_frames(
    vae_dec, dec_params, latents: jnp.ndarray, mesh: Optional[Mesh] = None
) -> jnp.ndarray:
    """Chunk-streamed VAE decode of scaled latents -> images in [-1, 1].

    The chunk size is owned by the decoder type (``decode_chunk``: 16 for the
    temporal decoder, matching the reference `pipeline_mikudance.py:81,138`;
    4 for the frame-independent SD decoder, a pure memory knob — the reference
    decodes frame-at-a-time, `:115-130`). The remainder is decoded as its own
    smaller chunk, NOT zero-padded: pad frames would bleed into real frames
    through the temporal decoder's cross-frame convolutions.

    With a mesh: the SD decoder shards frames over all devices; the temporal
    decoder shards whole 16-frame chunks (its numerical unit) when they divide
    the device count, else falls back to the single-device stream.
    """
    N = latents.shape[0]
    if mesh is not None:
        n = mesh.devices.size
        coupled = getattr(vae_dec, "frames_coupled", False)
        chunk = getattr(vae_dec, "decode_chunk", 4)
        if not coupled:
            z = _pad_leading(latents, (-N) % n)
            local = shard_map(
                lambda p, zz: _decode_chunked(vae_dec, p, zz),
                mesh=mesh, in_specs=(P(), _SHARD_SPEC), out_specs=_SHARD_SPEC,
               
            )
            return local(dec_params, z)[:N]
        if N % chunk == 0 and (N // chunk) % n == 0:
            zg = latents.reshape((N // chunk, chunk) + latents.shape[1:])
            local = shard_map(
                lambda p, zz: jax.lax.map(
                    lambda c: vae_dec.apply(p, c / SD_LATENT_SCALE), zz
                ),
                mesh=mesh, in_specs=(P(), _SHARD_SPEC), out_specs=_SHARD_SPEC,

            )
            out = local(dec_params, zg)
            return out.reshape((N,) + out.shape[2:])
        if chunk % n == 0 and N >= chunk:
            # headline case (e.g. one 16-frame chunk on 8 devices): shard the
            # frames WITHIN each chunk — temporal convs halo-exchange across
            # the shard boundaries and joint norms psum their moments, so the
            # result matches the single-device decode (same math, not an
            # approximation). Remainder frames (< one chunk) decode unsharded.
            return _decode_frame_sharded(vae_dec, dec_params, latents, mesh)
        # temporal decoder with non-dividing chunk layout: exact > parallel
    return _decode_chunked(vae_dec, dec_params, latents)


def _decode_frame_sharded(vae_dec, dec_params, latents, mesh: Mesh):
    """Temporal-decoder chunks decoded with frames sharded over ALL mesh
    devices (flattened to one 'frames' axis)."""
    n = mesh.devices.size
    chunk = getattr(vae_dec, "decode_chunk", 16)
    N = latents.shape[0]
    fmesh = Mesh(mesh.devices.reshape(-1), ("frames",))
    dec_sh = vae_dec.clone(frame_axis="frames")
    local = shard_map(
        lambda p, zz: dec_sh.apply(p, zz / SD_LATENT_SCALE),
        mesh=fmesh, in_specs=(P(), P("frames")), out_specs=P("frames"),
    )
    parts = []
    for i in range(0, N - (N % chunk), chunk):
        parts.append(local(dec_params, latents[i : i + chunk]))
    if N % chunk:
        parts.append(
            _decode_chunked(vae_dec, dec_params, latents[N - (N % chunk) :])
        )
    return jnp.concatenate(parts, axis=0)


def to_unit_float(x, signed: bool) -> jnp.ndarray:
    """Device-side image normalization. uint8 inputs are shipped to the
    device RAW and scaled there: the host->device link is the bottleneck
    (354 MB of fp32 frames took 9.3 s of the 35 s headline run), so frames
    travel at 1 byte/px. signed=True -> [-1, 1] (VAE image range), else [0, 1]
    (the condition streams, matching the reference's do_normalize=False
    processor, `pipeline_mikudance.py:341-360`)."""
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32)
        return x / 127.5 - 1.0 if signed else x / 255.0
    return x


def build_condition_stack(
    ref_latent: jnp.ndarray,  # (1, h, w, 4)
    skel_latent: jnp.ndarray,  # (1, h, w, 4)
    pose_latents: jnp.ndarray,  # (T, h, w, 4)
    face_latents: jnp.ndarray,  # (T, h, w, 4)
    hand_latents: jnp.ndarray,  # (T, h, w, 4)
) -> jnp.ndarray:
    """Per-frame 20-channel condition stack, channel order as the reference
    concat (`pipeline_mikudance.py:557-567`): [ref, skel, pose, face, hand]."""
    T = pose_latents.shape[0]
    ref = jnp.broadcast_to(ref_latent, (T,) + ref_latent.shape[1:])
    skel = jnp.broadcast_to(skel_latent, (T,) + skel_latent.shape[1:])
    return jnp.concatenate([ref, skel, pose_latents, face_latents, hand_latents], axis=-1)


def quantize_banks(banks: Dict[str, jnp.ndarray]):
    """Symmetric per-position int8 quantization of reference banks.

    Banks are LayerNormed hidden states (O(1) scale, zero-mean-ish) consumed
    as additive attention-K/V inputs — per-(position, key) scales keep the
    quantization error ~0.4% relative, far inside the 35 dB parity budget
    (tests/test_bank_streaming.py::test_cached_q8_matches_exact). int8 halves
    the bank bytes vs bf16, which is what lets a long video cache ALL
    (window, position) banks on one chip instead of recomputing them per
    (step, group) through the guidance UNet — the reference's long-video
    memory behavior (`pipeline_mikudance.py:647-653`) beaten, not matched.

    Returns (values int8, scales fp32 (n, 1, 1)) dicts."""
    qv, qs = {}, {}
    for k, v in banks.items():
        vf = v.astype(jnp.float32)
        amax = jnp.max(jnp.abs(vf), axis=(1, 2), keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        qv[k] = jnp.clip(jnp.round(vf / s), -127, 127).astype(jnp.int8)
        qs[k] = s
    return qv, qs


def dequantize_banks(qv, qs, dtype) -> Dict[str, jnp.ndarray]:
    return {
        k: (qv[k].astype(jnp.float32) * qs[k]).astype(dtype) for k in qv
    }


def choose_bank_group(num_windows: int, window_len: int, budget_positions: int,
                      n_shards: int = 1) -> Optional[int]:
    """Largest divisor g of num_windows with g*window_len <= budget (min 1):
    the window-group size for per-step bank recomputation. With ``n_shards``
    the group count must also split evenly over the shards ((nw/g) % n == 0 —
    each device scans the same number of groups); returns None when no such
    g exists (caller falls back to single-device streaming)."""
    best = None
    for g in range(1, num_windows + 1):
        if (num_windows % g == 0 and g * window_len <= budget_positions
                and (num_windows // g) % n_shards == 0):
            best = g
    if n_shards == 1 and best is None:
        best = 1  # a single over-budget window group: stream window-by-window
    return best


def guidance_context_for_windows(
    windows: np.ndarray,  # (nw, wf)
    ctx_cond: jnp.ndarray,  # (1, S, 768)
    ctx_uncond: jnp.ndarray,  # (1, S, 768)
    mode: str,
) -> jnp.ndarray:
    """(nw*wf, S, 768) CLIP context for the guidance UNet, per window position."""
    nw, wf = windows.shape
    if mode == "cond":
        return jnp.broadcast_to(ctx_cond, (nw * wf,) + ctx_cond.shape[1:])
    if mode == "reference_inference":
        # reference tiles [u, c] f times; cond half position k gets index f+k.
        use_uncond = (np.arange(wf) + wf) % 2 == 0  # (wf,)
        mask = jnp.asarray(np.tile(use_uncond, nw))[:, None, None]
        return jnp.where(mask, ctx_uncond, ctx_cond)
    raise ValueError(f"unknown guidance_clip_mode {mode!r}")


class VideoPipeline:
    """Host-side orchestrator around the jitted sampling functions."""

    def __init__(
        self,
        bundle: ModelBundle,
        config: PipelineConfig = PipelineConfig(),
        schedule: Optional[DDIMSchedule] = None,
        devices: Optional[Sequence[jax.Device]] = None,
    ):
        """``devices``: >1 device activates SPMD inference — the CFG x window
        batch shards over a 'win' mesh axis and frames within a window over a
        'frame' axis (sequence parallelism; the motion modules reshard via
        all_to_all, see models/motion_module.py). This replaces the
        reference's strictly single-GPU sequential window loop
        (`pipeline_mikudance.py:624-667`, device at `inference_video.py:70`)."""
        self.bundle = bundle
        self.config = config
        self.devices = tuple(devices) if devices is not None else None
        self.schedule = schedule or DDIMSchedule.create(
            beta_schedule=config.scheduler.beta_schedule,
            prediction_type=config.scheduler.prediction_type,
            rescale_betas_zero_snr=config.scheduler.rescale_betas_zero_snr,
            num_train_timesteps=config.scheduler.num_train_timesteps,
            beta_start=config.scheduler.beta_start,
            beta_end=config.scheduler.beta_end,
        )
        # IMPORTANT: every jitted function takes the parameter trees as
        # explicit arguments — closing over them would bake ~GBs of weights
        # into the jaxpr as compile-time constants and stall XLA.
        # the two denoise programs carry ~85% of the wall time: compile them
        # with the swept TPU options (core/compile_opts.py)
        self._denoise_jit = tuned_jit(
            self._denoise, static_argnames=("num_windows", "window_len", "mesh")
        )
        self._denoise_streamed_jit = tuned_jit(
            self._denoise_streamed,
            static_argnames=("num_windows", "window_len", "group", "mesh"),
        )
        self._encode_jit = jax.jit(
            partial(encode_frames, self.bundle.vae_enc), static_argnames=("chunk", "mesh")
        )
        self._decode_jit = jax.jit(self._decode, static_argnames=("mesh",))
        self._banks_jit = jax.jit(self._compute_banks, static_argnames=("mesh",))
        self._interp_jit = jax.jit(interpolation.interpolate_latents, static_argnums=(1, 2))
        self._quant_jit = jax.jit(quantize_banks)
        # donated in-place fill of the preallocated int8 cache (no 2x copy)
        self._bank_fill_jit = jax.jit(
            lambda buf, piece, i: jax.tree.map(
                lambda b, p: jax.lax.dynamic_update_slice_in_dim(b, p, i, 0),
                buf, piece,
            ),
            donate_argnums=0,
        )

    def _compute_banks_q8(self, gp, window_cond, window_motion, g_ctx, chunk):
        """All (window, position) banks, guidance UNet streamed in position
        chunks, quantized to int8 as they are produced (peak extra memory =
        one chunk's bf16 banks). Returns the (values, scales) tuple consumed
        by ``_denoise_streamed``'s quantized cache path."""
        n = window_cond.shape[0]
        chunk = max(1, min(chunk, n))
        buf = None
        for i in range(0, n, chunk):
            b = self._banks_jit(
                gp, window_cond[i:i + chunk], window_motion[i:i + chunk],
                g_ctx[i:i + chunk], mesh=None,
            )
            piece = self._quant_jit(b)
            if buf is None:
                buf = jax.tree.map(
                    lambda p: jnp.zeros((n,) + p.shape[1:], p.dtype), piece
                )
            buf = self._bank_fill_jit(buf, piece, jnp.int32(i))
        return buf

    # ------------------------------------------------------------------ banks
    def _compute_banks(
        self, guide_params, window_cond: jnp.ndarray, window_motion: jnp.ndarray,
        g_ctx: jnp.ndarray, mesh: Optional[Mesh] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Guidance UNet over all (window, position) condition frames; t=0.
        The guidance UNet is strictly per-frame, so with a mesh the frames
        shard over all devices (zero-pad to the device count, slice after)."""
        if mesh is None:
            n = window_cond.shape[0]
            t0 = jnp.zeros((n,), jnp.int32)
            return self.bundle.guide.apply(
                guide_params, window_cond, window_motion, t0, g_ctx
            )
        n_tok = window_cond.shape[0]
        pad = (-n_tok) % mesh.devices.size

        def local(p, c, m, g):
            t0 = jnp.zeros((c.shape[0],), jnp.int32)
            return self.bundle.guide.apply(p, c, m, t0, g)

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(), _SHARD_SPEC, _SHARD_SPEC, _SHARD_SPEC),
            out_specs=_SHARD_SPEC,
        )
        banks = fn(
            guide_params, _pad_leading(window_cond, pad),
            _pad_leading(window_motion, pad), _pad_leading(g_ctx, pad),
        )
        if pad:
            banks = {k: v[:n_tok] for k, v in banks.items()}
        return banks

    # ------------------------------------------------------- CFG fusion step
    def _fused_cfg_step(self, sum_u, sum_c, counts, scale, t, t_prev, latents):
        """Counter-normalized window fusion -> CFG mix -> one DDIM update
        (`pipeline_mikudance.py:577-678`). Shared by the cached and streamed
        denoisers — their equivalence test assumes this math is single-sourced.
        """
        inv = (1.0 / counts.astype(jnp.float32))[:, None, None, None]
        mean_u, mean_c = sum_u * inv, sum_c * inv
        noise_pred = mean_u + scale * (mean_c - mean_u)
        return self.schedule.step(noise_pred, t, t_prev, latents)

    # ---------------------------------------------------------------- denoise
    def _denoise(
        self,
        den_params,
        noise: jnp.ndarray,  # (T, h, w, 4) initial latents (sigma-scaled outside)
        banks: Dict[str, jnp.ndarray],  # each (nw*wf, S, C) cond-half banks
        ctx_cond: jnp.ndarray,  # (1, S, 768)
        windows: jnp.ndarray,  # (nw, wf) int32
        counts: jnp.ndarray,  # (T,) float32 window coverage per frame
        ts: jnp.ndarray,  # (steps,) int32
        prev_ts: jnp.ndarray,  # (steps,) int32
        guidance_scale: jnp.ndarray,  # scalar
        *,
        num_windows: int,
        window_len: int,
        mesh: Optional[Mesh] = None,
    ) -> jnp.ndarray:
        nw, wf = num_windows, window_len
        T = noise.shape[0]
        compute_dtype = self.bundle.den.dtype

        # Step-invariant K/V hoisting: banks and the CLIP context never change
        # across DDIM steps, so their attn1/attn2 K/V projections run ONCE
        # here (outside the scan) instead of inside all `steps` iterations;
        # the scan receives projected K/V, not raw banks. CFG batch: first nw
        # windows uncond (zero bank-K/V + zero context — by linearity exactly
        # the reference's plain-self-attention uncond bypass).
        if HOIST_BANK_KV:
            banks_kv = precompute_reference_kv(den_params, banks, compute_dtype)
            banks2 = {
                k: (jnp.concatenate([jnp.zeros_like(kk), kk], axis=0),
                    jnp.concatenate([jnp.zeros_like(vv), vv], axis=0))
                for k, (kk, vv) in banks_kv.items()
            }
        else:
            banks2 = {
                k: jnp.concatenate([jnp.zeros_like(v), v], axis=0)
                for k, v in banks.items()
            }
        ctx_u = jnp.zeros_like(ctx_cond)
        ctx2 = jnp.concatenate(
            [
                jnp.broadcast_to(ctx_u, (nw,) + ctx_cond.shape[1:]),
                jnp.broadcast_to(ctx_cond, (nw,) + ctx_cond.shape[1:]),
            ],
            axis=0,
        ).astype(compute_dtype)
        ctx_kv2 = precompute_context_kv(
            den_params, ctx2, bank_keys(self.bundle.den.cfg.unet), compute_dtype
        ) if HOIST_CTX_KV else None

        unet_apply = None
        if mesh is not None:
            # SPMD UNet: (2nw, wf) shards over the ('win', 'frame') mesh. The
            # windows axis is collective-free; the frame axis reshards inside
            # each motion module (all_to_all). Bank K/V are passed 4-D so
            # their shards line up with the UNet's internal (B*T) frame fold.
            banks2 = jax.tree.map(
                lambda v: v.reshape((2 * nw, wf) + v.shape[1:]), banks2
            )
            df = mesh.shape[mesh_lib.FRAME_AXIS]
            den_sh = self.bundle.den.clone(
                frame_axis=mesh_lib.FRAME_AXIS, frame_shards=df
            )
            p_win = P(mesh_lib.WIN_AXIS)
            p_wf = P(mesh_lib.WIN_AXIS, mesh_lib.FRAME_AXIS)

            def unet_local(params, batch, t_b, ctx, banks4, ctx_kv):
                bl, tl = batch.shape[0], batch.shape[1]
                banks_l = jax.tree.map(
                    lambda x: x.reshape((bl * tl,) + x.shape[2:]), banks4
                )
                if HOIST_BANK_KV:
                    return den_sh.apply(params, batch, t_b, ctx,
                                        banks_kv=banks_l, ctx_kv=ctx_kv)
                return den_sh.apply(params, batch, t_b, ctx, banks_l,
                                    ctx_kv=ctx_kv)

            unet_apply = shard_map(
                unet_local, mesh=mesh,
                in_specs=(P(), p_wf, p_win, p_win, p_wf, p_win),
                out_specs=p_wf,
            )

        flat_idx = windows.reshape(-1)  # (nw*wf,)
        do_cfg = guidance_scale  # scalar, used in fp32 math

        def step_fn(latents, t_pair):
            t, t_prev = t_pair
            win = latents[windows]  # (nw, wf, h, w, 4)
            batch = jnp.concatenate([win, win], axis=0).astype(compute_dtype)
            t_b = jnp.full((2 * nw,), t, jnp.int32)
            if unet_apply is not None:
                pred = unet_apply(den_params, batch, t_b, ctx2, banks2, ctx_kv2)
            elif HOIST_BANK_KV:
                pred = self.bundle.den.apply(den_params, batch, t_b, ctx2,
                                             banks_kv=banks2, ctx_kv=ctx_kv2)
            else:
                pred = self.bundle.den.apply(den_params, batch, t_b, ctx2,
                                             banks2, ctx_kv=ctx_kv2)
            pred = pred.astype(jnp.float32)  # (2nw, wf, h, w, 4)

            pred_u, pred_c = pred[:nw], pred[nw:]
            sum_u = jax.ops.segment_sum(
                pred_u.reshape((nw * wf,) + pred_u.shape[2:]), flat_idx, num_segments=T
            )
            sum_c = jax.ops.segment_sum(
                pred_c.reshape((nw * wf,) + pred_c.shape[2:]), flat_idx, num_segments=T
            )
            return (
                self._fused_cfg_step(sum_u, sum_c, counts, do_cfg, t, t_prev, latents),
                None,
            )

        latents, _ = jax.lax.scan(step_fn, noise.astype(jnp.float32), (ts, prev_ts))
        return latents

    # ------------------------------------------------------ denoise (grouped)
    def _denoise_streamed(
        self,
        guide_params,
        den_params,
        noise: jnp.ndarray,  # (T, h, w, 4)
        cond20: jnp.ndarray,  # (T, h, w, 20)
        motion: jnp.ndarray,  # (T, h, w, 2)
        ctx_cond: jnp.ndarray,  # (1, S, 768)
        g_ctx: jnp.ndarray,  # (nw*wf, S, 768) guidance CLIP ctx per position
        windows: jnp.ndarray,  # (nw, wf) int32
        counts: jnp.ndarray,  # (T,) float32
        win_w: jnp.ndarray,  # (nw,) float32: fusion weight per window (0 for
        # SPMD pad windows — duplicated so the groups split over the shards;
        # their predictions are masked out of the segment sums)
        ts: jnp.ndarray,
        prev_ts: jnp.ndarray,
        guidance_scale: jnp.ndarray,
        banks_cached=None,  # dict of (ngroups, group*wf, S, C): precomputed
        # banks per group (the cached-grouped mode); None -> recompute per step.
        # An (int8 values, fp32 scales) TUPLE is the deduplicated quantized
        # cache (bank_mode="cached_q8"): full (n_unique, S, C) buffers the
        # group scan gathers from via ``bank_idx``.
        bank_idx=None,  # (nw*wf,) int32 position -> unique-bank row (q8 only)
        *,
        num_windows: int,
        window_len: int,
        group: int,
        mesh: Optional[Mesh] = None,
    ) -> jnp.ndarray:
        """Long-video denoise: the UNet runs over window GROUPS (an inner
        scan), never over all windows at once — a 768^2 full-window batch
        materializes multi-GB GEGLU intermediates and cannot fit one chip
        past ~1 window. Two bank modes share the loop:

        - ``banks_cached`` given: banks were computed ONCE outside the scan
          (the window count fits the bank budget but the UNet batch does
          not — e.g. 40 frames / 2 windows at 768^2).
        - ``banks_cached=None``: banks are recomputed per (step, group) — the
          long-video mode where even storing all banks is impossible; this is
          the reference's own memory behavior (`pipeline_mikudance.py:647-653`
          recomputes banks per window x step).

        CFG runs as two multiply-masked passes (banks * m, ctx * m for
        m in {0, 1}) instead of a doubled batch: identical math (the uncond
        half IS zero banks + zero CLIP context), half the activation
        footprint, and no materialized zero-bank tensors.

        With ``mesh``: the window GROUPS shard over the flattened device
        grid — each device scans its own ngroups/n groups (banks stay
        group-local, so per-device memory is unchanged) and the per-step
        window-fusion sums psum before the shared DDIM update, which every
        device computes identically on the replicated latents.
        """
        nw, wf = num_windows, window_len
        T = noise.shape[0]
        cdtype = self.bundle.den.dtype
        gdtype = self.bundle.guide.dtype
        ngroups = nw // group
        win_g = jnp.asarray(windows).reshape(ngroups, group, wf)
        winw_g = jnp.asarray(win_w, jnp.float32).reshape(ngroups, group)
        gctx_g = g_ctx.reshape((ngroups, group * wf) + g_ctx.shape[1:])

        ctx_b = jnp.broadcast_to(
            ctx_cond, (group,) + ctx_cond.shape[1:]
        ).astype(cdtype)
        do_cfg = guidance_scale
        recompute = banks_cached is None
        quantized = isinstance(banks_cached, tuple)
        if quantized:
            # deduplicated int8 cache: full (n_unique, S, C) buffers stay a
            # scan constant (replicated under SPMD — int8 + dedup keeps them
            # ~4x below the fp32 per-position footprint); each group gathers
            # + dequantizes only its own (group*wf) rows via bank_idx, so the
            # gather is local to every device's group shard.
            q_vals, q_scales = banks_cached
            idx_g = bank_idx.reshape(ngroups, group * wf)
        elif not recompute:
            # banks arrive FLAT (nw*wf, S, C) and reshape here, inside jit:
            # a host-side reshape of a concrete device array materializes a
            # second ~GB-scale copy that then lives through decode (observed
            # OOMing the 16 GB chip at T=40); in-trace it fuses away.
            banks_g = {
                k: v.reshape((ngroups, group * wf) + v.shape[1:])
                for k, v in banks_cached.items()
            }

        def denoise_all(gp, dp, win_g_l, winw_g_l, gctx_g_l, banks_g_l,
                        q_const, cond_a, motion_a, noise_a, ctx_a, counts_a,
                        ts_a, prev_ts_a, scale_a, axis=None):
            def step_fn(latents, t_pair):
                t, t_prev = t_pair
                # Tie the condition stack to the scan carry: the bank
                # computation is loop-invariant, and XLA's while-loop
                # invariant code motion would otherwise hoist it out of the
                # scan and materialize ALL banks again — exactly what this
                # path exists to avoid.
                cond_tied, motion_tied, lat = jax.lax.optimization_barrier(
                    (cond_a, motion_a, latents)
                )

                def group_fn(carry, ginp):
                    sum_u, sum_c = carry
                    if recompute:
                        w_g, ww, gctx = ginp  # (group, wf), (group,), (group*wf, S, 768)
                    elif quantized:
                        w_g, ww, idx = ginp  # idx: (group*wf,) unique-bank rows
                        qv, qs = q_const
                        banks = dequantize_banks(
                            {k: qv[k][idx] for k in qv},
                            {k: qs[k][idx] for k in qs},
                            cdtype,
                        )
                    else:
                        w_g, ww, banks = ginp
                    flat = w_g.reshape(-1)
                    if recompute:
                        t0 = jnp.zeros((group * wf,), jnp.int32)
                        banks = self.bundle.guide.apply(
                            gp,
                            cond_tied[flat].astype(gdtype),
                            motion_tied[flat].astype(gdtype),
                            t0,
                            gctx.astype(gdtype),
                        )
                    win = lat[w_g].astype(cdtype)  # (group, wf, h, w, 4)
                    t_b = jnp.full((group,), t, jnp.int32)

                    def half(cond: bool):
                        # CFG as two passes: uncond IS zero banks + zero CLIP
                        # context (no doubled batch) — expressed as banks=None
                        # (ref=None is plain self-attention, the same math)
                        # so no bank-sized zero-multiplies hit HBM per step.
                        return self.bundle.den.apply(
                            dp, win, t_b,
                            ctx_a if cond else jnp.zeros_like(ctx_a),
                            banks if cond else None,
                        ).astype(jnp.float32)

                    pu, pc = half(False), half(True)
                    # mask pad windows (weight 0) out of the fusion sums
                    wmask = ww[:, None, None, None, None]
                    sum_u = sum_u + jax.ops.segment_sum(
                        (pu * wmask).reshape((group * wf,) + pu.shape[2:]), flat,
                        num_segments=T,
                    )
                    sum_c = sum_c + jax.ops.segment_sum(
                        (pc * wmask).reshape((group * wf,) + pc.shape[2:]), flat,
                        num_segments=T,
                    )
                    return (sum_u, sum_c), None

                zero = jnp.zeros_like(lat)
                if axis is not None:
                    # the scan's inputs vary over the group-shard axis, so its
                    # carry must be marked varying too (shard_map vma check);
                    # pcast replaces the deprecated pvary
                    zero = jax.lax.pcast(zero, (axis,), to="varying")
                # the banks slot carries gctx (recompute), the (ngroups,
                # group*wf) bank_idx rows (quantized), or the banks themselves
                xs = (win_g_l, winw_g_l, gctx_g_l if recompute else banks_g_l)
                (sum_u, sum_c), _ = jax.lax.scan(group_fn, (zero, zero), xs)
                if axis is not None:
                    sum_u = jax.lax.psum(sum_u, axis)
                    sum_c = jax.lax.psum(sum_c, axis)
                return (
                    self._fused_cfg_step(
                        sum_u, sum_c, counts_a, scale_a, t, t_prev, lat
                    ),
                    None,
                )

            latents, _ = jax.lax.scan(
                step_fn, noise_a.astype(jnp.float32), (ts_a, prev_ts_a)
            )
            return latents

        if quantized:
            bank_slot = idx_g  # sharded with the groups; the gather is local
            q_const = (q_vals, q_scales)  # replicated dedup'd int8 buffers
        elif recompute:
            bank_slot = None
            q_const = None
        else:
            bank_slot = banks_g
            q_const = None
        if mesh is None:
            return denoise_all(
                guide_params, den_params, win_g, winw_g, gctx_g, bank_slot,
                q_const, cond20, motion,
                noise, ctx_b, counts, ts, prev_ts, do_cfg,
            )
        gmesh = Mesh(mesh.devices.reshape(-1), ("wgrp",))
        rep = (P(),) * 2
        shard = (P("wgrp"), P("wgrp"), P("wgrp"), P("wgrp"))
        fn = shard_map(
            partial(denoise_all, axis="wgrp"),
            mesh=gmesh,
            in_specs=rep + shard + (P(),) * 9,
            out_specs=P(),
        )
        return fn(
            guide_params, den_params, win_g, winw_g, gctx_g,
            bank_slot, q_const, cond20, motion, noise,
            ctx_b, counts, ts, prev_ts, do_cfg,
        )

    # -------------------------------------------------- execution-size chunks
    def _steps_per_exec(self, steps: int, nw: int, wf: int) -> int:
        """How many DDIM steps one grouped-denoise XLA execution may cover
        (`max_exec_frame_passes`): long videos are sliced into equal-length
        host-dispatched step chunks so no single device program runs for
        minutes (see the config comment). Returns a divisor of ``steps`` so
        every chunk reuses ONE compiled program."""
        budget = self.config.max_exec_frame_passes
        if not budget:
            return steps
        k_raw = max(1, budget // (2 * nw * wf))
        if k_raw >= steps:
            return steps
        for k in range(k_raw, 0, -1):
            if steps % k == 0:
                return k
        return 1

    def _denoise_streamed_chunked(
        self, noise, ts, prev_ts, *, num_windows, window_len, call,
    ):
        """Host loop over step chunks; ``call(latents, ts_c, prev_ts_c)``
        dispatches one chunk. The DDIM recursion is sequential over steps, so
        chunk boundaries change nothing but the execution granularity; the
        latents carry stays on device between chunks (no transfers)."""
        steps = len(ts)
        k = self._steps_per_exec(steps, num_windows, window_len)
        lat = jnp.asarray(noise)
        for i in range(0, steps, k):
            lat = call(lat, jnp.asarray(ts[i : i + k]),
                       jnp.asarray(prev_ts[i : i + k]))
        return lat

    # ----------------------------------------------------------------- decode
    def _decode(
        self, dec_params, latents: jnp.ndarray, mesh: Optional[Mesh] = None
    ) -> jnp.ndarray:
        imgs = decode_frames(self.bundle.vae_dec, dec_params, latents, mesh=mesh)
        imgs = jnp.clip(imgs.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
        # Convert to uint8 ON DEVICE: the axon host link is slow (~15 MB/s
        # D2H), so shipping the 768^2 video as fp32 would dominate wall time.
        return jnp.round(imgs * 255.0).astype(jnp.uint8)

    # ----------------------------------------------------------- decode->host
    def decode_to_host(self, latents: jnp.ndarray) -> np.ndarray:
        """Decode + fetch with transfer/compute overlap: chunks are dispatched
        back-to-back (async JAX dispatch) and each chunk's D2H copy starts as
        soon as it is computed, riding under the NEXT chunk's decode. The
        serial decode-then-fetch path left the slow host link idle during the
        whole decode (~1.2 s of a 28 s run). Only used for frame-independent
        decoders; the temporal decoder's 16-frame chunk is its numerical unit
        and decodes whole (`pipeline_mikudance.py:81,132-150`)."""
        dec = self.bundle.vae_dec
        # The temporal decoder's numerical unit is its 16-frame chunk, and
        # _decode_chunked already splits at those boundaries inside one
        # program — so dispatching per-chunk executions here is the SAME math,
        # but lets chunk i's D2H copy ride under chunk i+1's decode (VERDICT
        # r4 #7). For T == one chunk this degenerates to decode-then-fetch
        # (the chunk is indivisible); for long videos it hides all but the
        # last chunk's transfer.
        chunk = min(getattr(dec, "decode_chunk", 4), latents.shape[0])
        N = latents.shape[0]
        parts = []
        for i in range(0, N - (N % chunk), chunk):
            img = self._decode_jit(
                self.bundle.vae_dec_params, latents[i : i + chunk]
            )
            img.copy_to_host_async()
            parts.append(img)
        if N % chunk:
            img = self._decode_jit(self.bundle.vae_dec_params, latents[N - N % chunk :])
            img.copy_to_host_async()
            parts.append(img)
        return np.concatenate([np.asarray(p) for p in parts], axis=0)

    # ------------------------------------------------------------------- call
    def __call__(
        self,
        ref_image: np.ndarray,  # (H, W, 3) in [-1, 1] float, or raw uint8
        ref_skel: np.ndarray,  # (H, W, 3) in [0, 1] float, or raw uint8
        pose_frames: np.ndarray,  # (T, H, W, 3) in [0, 1] float, or raw uint8
        face_frames: Optional[np.ndarray],  # as pose_frames, or None if absent
        hand_frames: Optional[np.ndarray],  # as pose_frames, or None if absent
        scene_motion: np.ndarray,  # (T, h, w, 2) latent-res flow
        clip_context: np.ndarray,  # (1, S, 768) CLIP image tokens of ref image
        noise: np.ndarray,  # (T, h, w, 4) initial gaussian latents
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        decode: bool = True,
        to_host: bool = False,
        timer=None,  # utils.profiling.Timer: per-phase wall times (syncs
        # between phases, so pass None for clean end-to-end measurements)
    ) -> jnp.ndarray:
        if timer is not None:
            import time as _time

            from ..utils.profiling import force as _force

            _t0 = [_time.perf_counter()]

            def mark(name, sync_val):
                _force(sync_val)
                now = _time.perf_counter()
                timer.phases[name] = timer.phases.get(name, 0.0) + now - _t0[0]
                _t0[0] = now
        else:
            def mark(name, sync_val):
                pass

        cfgc = self.config
        steps = num_inference_steps or cfgc.num_inference_steps
        scale = cfgc.guidance_scale if guidance_scale is None else guidance_scale
        T = pose_frames.shape[0]

        # 0. device mesh (multi-chip inference): axes sized from this call's
        # static window geometry.
        mesh = None
        if self.devices is not None and len(self.devices) > 1:
            nw0 = ctx_sched.window_matrix(
                T, cfgc.context.frames, cfgc.context.stride, cfgc.context.overlap
            ).shape
            mesh = mesh_lib.choose_2d_mesh(self.devices, 2 * nw0[0], nw0[1])

        # 1. batched VAE encodes (ONE call for every condition stream —
        # measured faster than per-stream calls: the host link pays a high
        # per-transfer latency, so one big transfer beats four pipelined
        # ones). uint8 inputs ship raw and normalize on device
        # (see to_unit_float). An ABSENT face/hand stream (None) is the
        # reference's all-black fallback (`scripts/inference_video.py`
        # black_frames): one black frame is encoded and its latent broadcast
        # over T — identical numerics, no T-frame transfer/encode for a
        # stream that carries no signal (the reference encodes every black
        # frame, `pipeline_mikudance.py:505-549`).
        H_img, W_img = pose_frames.shape[1:3]

        def _collapse_black(frames):
            # A present-but-all-black uint8 stream IS the absent-stream
            # fallback (the reference CLI substitutes black frames for
            # missing face/hand videos): collapse it to the 1-frame
            # broadcast path — the VAE encode is deterministic per frame,
            # so encoding one black frame and broadcasting its latent is
            # EXACTLY the per-frame result, minus a T-frame transfer +
            # encode of pure zeros. The host-side scan is ~ms on uint8.
            if (isinstance(frames, np.ndarray) and frames.dtype == np.uint8
                    and not frames.any()):
                return None
            return frames

        face_frames = _collapse_black(face_frames)
        hand_frames = _collapse_black(hand_frames)

        black = np.zeros((1, H_img, W_img, 3), np.uint8)

        def _np4(x):  # host arrays to (n, H, W, 3); device arrays untouched
            if isinstance(x, np.ndarray):
                return x[None] if x.ndim == 3 else x
            return x

        raw = [
            _np4(ref_image),
            _np4(ref_skel),
            pose_frames,
            black if face_frames is None else face_frames,
            black if hand_frames is None else hand_frames,
        ]
        if all(isinstance(p, np.ndarray) and p.dtype == np.uint8 for p in raw):
            # ONE stacked H2D transfer: the axon link charges a high
            # per-transfer latency (~0.2-0.3 s each), so five stream-wise
            # transfers cost more than one memcpy'd concat. Normalization
            # happens on device (to_unit_float contract): row 0 is the ref
            # image ([-1, 1]); everything after is a [0, 1] condition stream.
            stacked = jnp.asarray(np.concatenate(raw, axis=0))
            f = stacked.astype(jnp.float32)
            all_frames = jnp.concatenate([f[:1] / 127.5 - 1.0, f[1:] / 255.0], 0)
        else:
            parts = [
                to_unit_float(ref_image, signed=True).reshape(
                    (1, H_img, W_img, 3)),
                to_unit_float(ref_skel, signed=False).reshape(
                    (1, H_img, W_img, 3)),
                to_unit_float(pose_frames, signed=False),
                to_unit_float(black if face_frames is None else face_frames,
                              signed=False),
                to_unit_float(black if hand_frames is None else hand_frames,
                              signed=False),
            ]
            all_frames = jnp.concatenate(parts, axis=0)
        mark("h2d_normalize", all_frames)
        lat = self._encode_jit(self.bundle.vae_enc_params, all_frames, mesh=mesh)
        mark("vae_encode", lat)
        ref_l, skel_l = lat[0:1], lat[1:2]
        o = 2 + T
        pose_l = lat[2:o]
        n_face = raw[3].shape[0]
        face_l = lat[o : o + n_face]
        hand_l = lat[o + n_face :]
        if n_face == 1:
            face_l = jnp.broadcast_to(face_l, (T,) + face_l.shape[1:])
        if hand_l.shape[0] == 1:
            hand_l = jnp.broadcast_to(hand_l, (T,) + hand_l.shape[1:])
        cond20 = build_condition_stack(ref_l, skel_l, pose_l, face_l, hand_l)
        # drop the fp32 pixel stack + raw latents: they otherwise stay alive
        # (function locals) through denoise AND decode — ~0.7 GB at T=40
        del all_frames, lat, ref_l, skel_l, pose_l, face_l, hand_l

        # 2. windows (static per T)
        windows = ctx_sched.window_matrix(
            T, cfgc.context.frames, cfgc.context.stride, cfgc.context.overlap
        )
        counts = jnp.asarray(ctx_sched.frame_counts(windows, T), jnp.float32)
        nw, wf = windows.shape
        flat = windows.reshape(-1)

        # 3. bank residency: cache all (window, position) banks when they fit
        # (fastest — computed once, reused across steps), else stream them
        # per step in window groups (long videos; see _denoise_streamed).
        # A mesh shards the cached banks over its devices, scaling the budget.
        ctx_cond = jnp.asarray(clip_context)
        if cfgc.bank_mode not in ("auto", "cached", "per_step", "cached_q8"):
            raise ValueError(f"unknown bank_mode {cfgc.bank_mode!r}")
        # cached_q8: ALL positions' banks live on-chip as int8 (+fp32 scales)
        # — ~26 MB/position at 768^2 vs ~52 MB bf16 — so long videos skip the
        # per-(step, group) guidance-UNet recompute entirely (the reference
        # pays it every step x window, `pipeline_mikudance.py:647-653`).
        # Under SPMD the dedup'd int8 buffers replicate (they are already ~4x
        # below fp32 per-position size) and the window GROUPS shard, same as
        # bank streaming — each device's gather indexes only its own groups.
        q8 = cfgc.bank_mode == "cached_q8"
        budget = cfgc.cached_bank_positions * (mesh.devices.size if mesh else 1)
        per_step = cfgc.bank_mode == "per_step" or (
            cfgc.bank_mode == "auto" and nw * wf > budget
        )
        stream_mesh = None
        win_eff, win_w = windows, np.ones((nw,), np.float32)
        if (per_step or q8) and mesh is not None:
            # SPMD bank streaming / sharded q8: window groups shard over the
            # flattened device grid (streamed banks stay group-local, so
            # per-device memory is the single-device streaming footprint).
            # The group count must split evenly over the shards; when it
            # doesn't, PAD with duplicate zero-weight windows (their
            # predictions are masked out of the fusion sums — same math, no
            # silent single-device fallback) as long as one window fits the
            # relevant budget (bank memory for streaming, UNet batch for q8).
            n_dev = mesh.devices.size
            budget_pos = (cfgc.cached_bank_positions if per_step
                          else cfgc.max_denoise_frame_batch)
            if choose_bank_group(nw, wf, budget_pos, n_dev):
                stream_mesh = mesh
            elif wf <= budget_pos:
                pad = (-nw) % n_dev  # g=1 always valid at this count
                win_eff = np.concatenate(
                    [windows, np.repeat(windows[:1], pad, axis=0)], axis=0
                )
                win_w = np.concatenate(
                    [win_w, np.zeros((pad,), np.float32)], axis=0
                )
                stream_mesh = mesh
            else:
                kind = ("bank" if per_step else "UNet-batch")
                print(
                    f"bank streaming: one {wf}-frame window exceeds the "
                    f"{budget_pos}-position {kind} budget; "
                    "denoise runs single-device window-by-window"
                )
        nw_eff = win_eff.shape[0]
        g_ctx = guidance_context_for_windows(
            win_eff, ctx_cond, jnp.zeros_like(ctx_cond), cfgc.guidance_clip_mode
        ).astype(self.bundle.guide.dtype)

        ts, prev_ts = inference_step_pairs(
            self.schedule, steps, spacing=cfgc.scheduler.timestep_spacing
        )
        if per_step:
            group = choose_bank_group(
                nw_eff, wf, cfgc.cached_bank_positions,
                stream_mesh.devices.size if stream_mesh is not None else 1,
            )
            latents = self._denoise_streamed_chunked(
                noise, ts, prev_ts, num_windows=nw_eff, window_len=wf,
                call=lambda lat, ts_c, pts_c: self._denoise_streamed_jit(
                    self.bundle.guide_params,
                    self.bundle.den_params,
                    lat,
                    cond20,
                    jnp.asarray(scene_motion),
                    ctx_cond,
                    g_ctx,
                    jnp.asarray(win_eff),
                    counts,
                    jnp.asarray(win_w),
                    ts_c,
                    pts_c,
                    jnp.float32(scale),
                    num_windows=nw_eff,
                    window_len=wf,
                    group=group,
                    mesh=stream_mesh,
                ),
            )
            mark("denoise_streamed", latents)
        else:
            bank_idx = None
            if q8:
                # Deduplicate before caching: a bank depends only on
                # (frame, CLIP-context variant) — never on the window a
                # position sits in — so the cache holds one entry per unique
                # pair (~T entries) instead of one per (window, position)
                # (~1.4T with overlapping windows). The variant parity must
                # mirror guidance_context_for_windows (asserted in tests).
                gdt = self.bundle.guide.dtype
                if cfgc.guidance_clip_mode == "cond":
                    use_uncond = np.zeros(nw_eff * wf, np.int64)
                else:  # "reference_inference" interleaved [u, c] tiling
                    use_uncond = np.tile(
                        (np.arange(wf) + wf) % 2 == 0, nw_eff
                    ).astype(np.int64)
                pairs = win_eff.reshape(-1).astype(np.int64) * 2 + use_uncond
                uniq, inv = np.unique(pairs, return_inverse=True)
                bank_idx = inv.astype(np.int32)
                u_frames = (uniq // 2).astype(np.int32)
                u_mask = jnp.asarray((uniq % 2).astype(bool))[:, None, None]
                g_ctx_u = jnp.where(
                    u_mask, jnp.zeros_like(ctx_cond), ctx_cond
                ).astype(gdt)
                banks = self._compute_banks_q8(
                    self.bundle.guide_params,
                    cond20[u_frames].astype(gdt),
                    jnp.asarray(scene_motion)[u_frames].astype(gdt),
                    g_ctx_u,
                    chunk=cfgc.cached_bank_positions,
                )
            else:
                banks = self._banks_jit(
                    self.bundle.guide_params,
                    cond20[flat].astype(self.bundle.guide.dtype),
                    jnp.asarray(scene_motion)[flat].astype(self.bundle.guide.dtype),
                    g_ctx,
                    mesh=mesh,
                )
            mark("guidance_banks", banks)
            if q8 or (mesh is None and nw * wf > cfgc.max_denoise_frame_batch
                      and nw > 1):
                # cached-GROUPED: all banks fit, but one UNet batch over every
                # window does not (e.g. 2x30 windows at 768^2) — scan window
                # groups with the banks precomputed above. q8 under a mesh
                # shards the groups (stream_mesh); plain cached-grouped is a
                # single-chip path (a mesh takes the full-batch branch below).
                n_sh = stream_mesh.devices.size if stream_mesh is not None else 1
                group = choose_bank_group(
                    nw_eff, wf, cfgc.max_denoise_frame_batch, n_sh
                ) or 1
                latents = self._denoise_streamed_chunked(
                    noise, ts, prev_ts, num_windows=nw_eff, window_len=wf,
                    call=lambda lat, ts_c, pts_c: self._denoise_streamed_jit(
                        self.bundle.guide_params,
                        self.bundle.den_params,
                        lat,
                        cond20,
                        jnp.asarray(scene_motion),
                        ctx_cond,
                        g_ctx,
                        jnp.asarray(win_eff),
                        counts,
                        jnp.asarray(win_w),
                        ts_c,
                        pts_c,
                        jnp.float32(scale),
                        banks,
                        None if bank_idx is None else jnp.asarray(bank_idx),
                        num_windows=nw_eff,
                        window_len=wf,
                        group=group,
                        mesh=stream_mesh,
                    ),
                )
                del banks  # free ~GBs of cached banks before decode runs
            else:
                # 4. scan over DDIM steps
                latents = self._denoise_jit(
                    self.bundle.den_params,
                    jnp.asarray(noise),
                    banks,
                    ctx_cond,
                    jnp.asarray(windows),
                    counts,
                    jnp.asarray(ts),
                    jnp.asarray(prev_ts),
                    jnp.float32(scale),
                    num_windows=nw,
                    window_len=wf,
                    mesh=mesh,
                )
                del banks
            mark("denoise", latents)
        # 5. optional latent frame-rate upsampling (`pipeline_mikudance.py:688`)
        if cfgc.interpolation_factor > 1:
            latents = self._interp_jit(
                latents, cfgc.interpolation_factor, cfgc.interpolation_mode
            )

        if not decode:
            return latents
        if to_host and mesh is None:
            out = self.decode_to_host(latents)
            mark("decode_d2h", out)
            return out
        out = self._decode_jit(self.bundle.vae_dec_params, latents, mesh=mesh)
        mark("decode", out)
        return out
