"""Zero-SNR v-prediction DDIM, as pure jnp.

Semantics match the diffusers ``DDIMScheduler`` configuration used by the
reference (``/root/reference/configs/inference/mikudance_config.yaml:24-33``:
linear betas 0.00085..0.012, ``rescale_betas_zero_snr``, ``timestep_spacing
"trailing"``, ``prediction_type "v_prediction"``, ``clip_sample false``,
``steps_offset 1``; training uses the same with ``scaled_linear`` betas,
``/root/reference/scripts/train_stage1.py:255-264``).

Everything is a pure function of a small immutable ``DDIMSchedule`` dataclass,
so the whole sampling loop stays inside one ``jax.jit`` / ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Literal, Tuple

import jax.numpy as jnp
import numpy as np

BetaSchedule = Literal["linear", "scaled_linear"]
PredictionType = Literal["epsilon", "v_prediction"]


def make_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: BetaSchedule = "linear",
) -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    raise ValueError(f"unknown beta_schedule {beta_schedule!r}")


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal SNR is exactly zero (Lin et al. 2023).

    Mirrors diffusers' ``rescale_zero_terminal_snr``: shift & scale
    sqrt(alpha_bar) so sqrt(alpha_bar[T]) == 0 and sqrt(alpha_bar[0]) is kept.
    """
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)

    alphas_bar_sqrt_0 = alphas_bar_sqrt[0].copy()
    alphas_bar_sqrt_T = alphas_bar_sqrt[-1].copy()

    alphas_bar_sqrt = alphas_bar_sqrt - alphas_bar_sqrt_T
    alphas_bar_sqrt = alphas_bar_sqrt * alphas_bar_sqrt_0 / (
        alphas_bar_sqrt_0 - alphas_bar_sqrt_T
    )

    alphas_bar = alphas_bar_sqrt**2
    alphas = np.empty_like(alphas_bar)
    alphas[0] = alphas_bar[0]
    alphas[1:] = alphas_bar[1:] / alphas_bar[:-1]
    return 1.0 - alphas


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Immutable DDIM noise schedule. All arrays are float32 jnp arrays."""

    alphas_cumprod: jnp.ndarray  # [num_train_timesteps]
    num_train_timesteps: int
    prediction_type: PredictionType
    final_alpha_cumprod: float  # alpha_bar for the "t=-1" step (1.0: set_alpha_to_one)

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: BetaSchedule = "linear",
        prediction_type: PredictionType = "v_prediction",
        rescale_betas_zero_snr: bool = True,
        set_alpha_to_one: bool = True,
    ) -> "DDIMSchedule":
        betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        alphas_cumprod = np.cumprod(1.0 - betas)
        final = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
        return cls(
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
            final_alpha_cumprod=final,
        )

    # ----------------------------------------------------------------- utils
    def _gather(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.alphas_cumprod[t]

    def timesteps(
        self, num_inference_steps: int, spacing: str = "trailing"
    ) -> np.ndarray:
        """Inference timestep sequence (descending), static numpy.

        "trailing" spacing per diffusers: arange(T, 0, -T/steps).round()-1.
        """
        T = self.num_train_timesteps
        if spacing == "trailing":
            step_ratio = T / num_inference_steps
            ts = np.round(np.arange(T, 0, -step_ratio)).astype(np.int64) - 1
            return ts
        if spacing == "leading":
            step_ratio = T // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
            return ts.astype(np.int64) + 1  # steps_offset=1
        raise ValueError(f"unknown timestep spacing {spacing!r}")

    # ------------------------------------------------------------- sampling
    def step(
        self,
        model_output: jnp.ndarray,
        timestep: jnp.ndarray,
        prev_timestep: jnp.ndarray,
        sample: jnp.ndarray,
    ) -> jnp.ndarray:
        """One deterministic (eta=0) DDIM update x_t -> x_{t_prev}.

        ``prev_timestep`` may be negative, selecting ``final_alpha_cumprod``.
        """
        dtype = sample.dtype
        a_t = self._gather(timestep).astype(jnp.float32)
        a_prev = jnp.where(
            prev_timestep >= 0,
            self._gather(jnp.maximum(prev_timestep, 0)),
            jnp.float32(self.final_alpha_cumprod),
        ).astype(jnp.float32)
        b_t = 1.0 - a_t

        x = sample.astype(jnp.float32)
        out = model_output.astype(jnp.float32)
        sqrt_a, sqrt_b = jnp.sqrt(a_t), jnp.sqrt(b_t)
        if self.prediction_type == "v_prediction":
            pred_x0 = sqrt_a * x - sqrt_b * out
            pred_eps = sqrt_a * out + sqrt_b * x
        elif self.prediction_type == "epsilon":
            pred_x0 = (x - sqrt_b * out) / sqrt_a
            pred_eps = out
        else:
            raise ValueError(self.prediction_type)

        prev = jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1.0 - a_prev) * pred_eps
        return prev.astype(dtype)

    # ------------------------------------------------------------- training
    def add_noise(
        self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        a = self._gather(t).astype(jnp.float32)
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sa = jnp.sqrt(a).reshape(shape)
        sb = jnp.sqrt(1.0 - a).reshape(shape)
        return (sa * x0.astype(jnp.float32) + sb * noise.astype(jnp.float32)).astype(
            x0.dtype
        )

    def get_velocity(
        self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        a = self._gather(t).astype(jnp.float32)
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sa = jnp.sqrt(a).reshape(shape)
        sb = jnp.sqrt(1.0 - a).reshape(shape)
        return (sa * noise.astype(jnp.float32) - sb * x0.astype(jnp.float32)).astype(
            x0.dtype
        )

    def snr(self, t: jnp.ndarray) -> jnp.ndarray:
        """SNR(t) = alpha_bar / (1 - alpha_bar). With zero-SNR rescale, SNR(T-1)=0."""
        a = self._gather(t).astype(jnp.float32)
        return a / (1.0 - a)


def inference_step_pairs(
    schedule: DDIMSchedule, num_inference_steps: int, spacing: str = "trailing"
) -> Tuple[np.ndarray, np.ndarray]:
    """(timesteps, prev_timesteps) int32 arrays for a scan over DDIM steps."""
    ts = schedule.timesteps(num_inference_steps, spacing)
    prev = ts - schedule.num_train_timesteps // num_inference_steps
    return ts.astype(np.int32), prev.astype(np.int32)


def min_snr_loss_weight(
    schedule: DDIMSchedule,
    t: jnp.ndarray,
    gamma: float,
    prediction_type: PredictionType,
) -> jnp.ndarray:
    """Min-SNR-gamma per-sample loss weights (Hang et al.).

    Matches the reference trainer (`/root/reference/scripts/train_stage1.py:630-652`):
    epsilon: min(snr, gamma) / snr ; v_prediction: min(snr, gamma) / (snr + 1).
    """
    snr = schedule.snr(t)
    capped = jnp.minimum(snr, gamma)
    if prediction_type == "v_prediction":
        return capped / (snr + 1.0)
    return capped / jnp.maximum(snr, 1e-8)
