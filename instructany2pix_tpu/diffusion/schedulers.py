"""Diffusion schedulers as pure functions over static tables.

Replaces diffusers' stateful DDPMScheduler/DDIMScheduler objects
(reference pipeline.py:106-116, prior/model.py:134) with precomputed
jnp tables + pure step fns usable inside `lax.scan`. Numerics follow
diffusers' conventions so imported torch checkpoints sample
identically:

  * scaled_linear beta schedule (sqrt-space linear interpolation),
    beta_start 0.00085, beta_end 0.012, 1000 train steps — the SDXL /
    SD config (also used by the prior's DDPM, reference
    prior/model.py:134 "from SDXL config").
  * DDIM step with eta=0, optional clip_sample off, leading timestep
    spacing (diffusers default for SDXL img2img).
  * exact reverse-DDIM step for inversion (reference
    ddim/pnp_pipeline.py:73-85 `_backward_ddim`).
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: Literal["epsilon", "sample", "v_prediction"] = "epsilon"
    timestep_spacing: Literal["leading", "trailing", "linspace"] = "leading"
    steps_offset: int = 1
    set_alpha_to_one: bool = False


def make_betas(cfg: SchedulerConfig) -> np.ndarray:
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        return np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, n) ** 2
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, n)
    if cfg.beta_schedule == "squaredcos_cap_v2":
        t = np.arange(n + 1) / n

        def f(u):
            return np.cos((u + 0.008) / 1.008 * np.pi / 2) ** 2

        return np.clip(1 - f(t[1:]) / f(t[:-1]), 0, 0.999)
    raise ValueError(cfg.beta_schedule)


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Static tables, jnp arrays — safe to close over in jitted fns."""

    cfg: SchedulerConfig
    betas: jax.Array
    alphas_cumprod: jax.Array
    final_alpha_cumprod: jax.Array

    @staticmethod
    def create(cfg: SchedulerConfig = SchedulerConfig()) -> "Schedule":
        betas = make_betas(cfg)
        ac = np.cumprod(1.0 - betas)
        final = np.array(1.0 if cfg.set_alpha_to_one else ac[0])
        return Schedule(
            cfg,
            jnp.asarray(betas, jnp.float32),
            jnp.asarray(ac, jnp.float32),
            jnp.asarray(final, jnp.float32),
        )

    # ------------------------------------------------------------ helpers

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        """Descending inference timesteps (diffusers semantics)."""
        n = self.cfg.num_train_timesteps
        if self.cfg.timestep_spacing == "leading":
            step = n // num_inference_steps
            ts = (np.arange(num_inference_steps) * step).round()[::-1]
            ts = ts + self.cfg.steps_offset
        elif self.cfg.timestep_spacing == "trailing":
            ts = np.round(np.arange(n, 0, -n / num_inference_steps)) - 1
        else:  # linspace
            ts = np.linspace(0, n - 1, num_inference_steps)[::-1].round()
        return jnp.asarray(ts, jnp.int32)

    def alpha_bar(self, t: jax.Array) -> jax.Array:
        return jnp.where(
            t >= 0, self.alphas_cumprod[jnp.maximum(t, 0)], self.final_alpha_cumprod
        )

    def add_noise(self, x0, noise, t):
        a = self.alpha_bar(t).reshape((-1,) + (1,) * (x0.ndim - 1))
        return jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * noise

    def to_epsilon(self, model_out, sample, t):
        """Convert model output to ε under this schedule's prediction
        type (the prior's `get_eps`, reference prior/model.py:208-239)."""
        a = self.alpha_bar(t).reshape((-1,) + (1,) * (sample.ndim - 1))
        if self.cfg.prediction_type == "epsilon":
            return model_out
        if self.cfg.prediction_type == "sample":
            return (sample - jnp.sqrt(a) * model_out) / jnp.sqrt(1 - a)
        # v_prediction
        return jnp.sqrt(a) * model_out + jnp.sqrt(1 - a) * sample

    def to_x0(self, model_out, sample, t):
        a = self.alpha_bar(t).reshape((-1,) + (1,) * (sample.ndim - 1))
        if self.cfg.prediction_type == "epsilon":
            return (sample - jnp.sqrt(1 - a) * model_out) / jnp.sqrt(a)
        if self.cfg.prediction_type == "sample":
            return model_out
        return jnp.sqrt(a) * sample - jnp.sqrt(1 - a) * model_out

    # --------------------------------------------------------------- DDIM

    def ddim_step(self, model_out, t, t_prev, sample, eta: float = 0.0, noise=None):
        """One deterministic DDIM update x_t → x_{t_prev} (eta=0)."""
        a_t = self.alpha_bar(t).reshape((-1,) + (1,) * (sample.ndim - 1))
        a_prev = self.alpha_bar(t_prev).reshape((-1,) + (1,) * (sample.ndim - 1))
        x0 = self.to_x0(model_out, sample, t)
        eps = self.to_epsilon(model_out, sample, t)
        if eta > 0.0 and noise is not None:
            sigma = eta * jnp.sqrt(
                (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
            )
            dir_xt = jnp.sqrt(1 - a_prev - sigma**2) * eps
            return jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps

    def ddim_inverse_step(self, model_out, t, t_next, sample):
        """Exact reverse DDIM (x_t → x_{t_next}, t_next > t): the
        `_backward_ddim` update of reference ddim/pnp_pipeline.py:73-85."""
        a_t = self.alpha_bar(t).reshape((-1,) + (1,) * (sample.ndim - 1))
        a_next = self.alpha_bar(t_next).reshape((-1,) + (1,) * (sample.ndim - 1))
        eps = self.to_epsilon(model_out, sample, t)
        x0 = self.to_x0(model_out, sample, t)
        return jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps

    # --------------------------------------------------------------- DDPM

    def ddpm_timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        """diffusers DDPMScheduler.set_timesteps: descending
        (arange(N) * (train//N)) — note no +1 offset (unlike DDIM)."""
        ratio = self.cfg.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * ratio)[::-1]
        return jnp.asarray(ts.copy(), jnp.int32)

    def ddpm_step(
        self, model_out, t, sample, key, variance_type="fixed_small", t_prev=None
    ):
        """Ancestral DDPM update (the prior's scheduler step, reference
        prior/model.py:641-655). `t_prev` defaults to t-1 (training
        schedule); inference passes t - train//num_inference_steps like
        diffusers' previous_timestep."""
        a_bar_t = self.alpha_bar(t)
        a_bar_prev = self.alpha_bar(t - 1 if t_prev is None else t_prev)
        beta_t = 1 - a_bar_t / a_bar_prev
        alpha_t = 1 - beta_t
        shape = (-1,) + (1,) * (sample.ndim - 1)
        a_bar_t = a_bar_t.reshape(shape)
        a_bar_prev = a_bar_prev.reshape(shape)
        beta_t = beta_t.reshape(shape)
        alpha_t = alpha_t.reshape(shape)

        x0 = self.to_x0(model_out, sample, t)
        coef_x0 = jnp.sqrt(a_bar_prev) * beta_t / (1 - a_bar_t)
        coef_xt = jnp.sqrt(alpha_t) * (1 - a_bar_prev) / (1 - a_bar_t)
        mean = coef_x0 * x0 + coef_xt * sample

        var = (1 - a_bar_prev) / (1 - a_bar_t) * beta_t
        if variance_type == "fixed_small":
            var = jnp.clip(var, 1e-20, None)
        noise = jax.random.normal(key, sample.shape, sample.dtype)
        t_b = t.reshape(shape) if hasattr(t, "reshape") and jnp.ndim(t) else t
        nonzero = (jnp.asarray(t_b) > 0).astype(sample.dtype)
        return mean + nonzero * jnp.sqrt(var) * noise


def cfg_combine(uncond, cond, guidance_scale):
    """Classifier-free guidance mix."""
    return uncond + guidance_scale * (cond - uncond)


def lcm_timesteps(schedule: Schedule, num_inference_steps: int = 4) -> jnp.ndarray:
    """LCM inference timesteps: evenly spaced over the origin DDIM skip
    grid (diffusers LCMScheduler; the reference's disabled 4-step fast
    path, reference readme.MD:60 / sdxl_img2img_pipeline.py:90-105)."""
    n = schedule.cfg.num_train_timesteps
    lcm_origin_steps = 50
    c = n // lcm_origin_steps
    ddim_ts = (np.arange(1, lcm_origin_steps + 1) * c) - 1
    skip = lcm_origin_steps // num_inference_steps
    ts = ddim_ts[::-1][::skip][:num_inference_steps]
    return jnp.asarray(ts.copy(), jnp.int32)


def lcm_boundary_scalings(schedule: Schedule, t, sigma_data: float = 0.5):
    """Consistency-model boundary conditions c_skip(t), c_out(t)."""
    scaled = jnp.asarray(t, jnp.float32) * (10.0 / schedule.cfg.num_train_timesteps) * 100.0
    c_skip = sigma_data**2 / (scaled**2 + sigma_data**2)
    c_out = scaled / jnp.sqrt(scaled**2 + sigma_data**2)
    return c_skip, c_out


def lcm_step(schedule: Schedule, model_out, t, t_prev, sample, key=None):
    """One LCM update: consistency-parameterized x0 estimate, then jump
    to the next timestep's noise level (requires LCM-distilled UNet
    weights to produce good samples; the stepping itself is weight-
    agnostic)."""
    x0 = schedule.to_x0(model_out, sample, t)
    c_skip, c_out = lcm_boundary_scalings(schedule, t)
    shape = (-1,) + (1,) * (sample.ndim - 1)
    denoised = c_skip.reshape(shape) * sample + c_out.reshape(shape) * x0
    a_prev = schedule.alpha_bar(t_prev).reshape(shape)
    noise = (
        jax.random.normal(key, sample.shape, sample.dtype)
        if key is not None
        else jnp.zeros_like(sample)
    )
    is_last = (jnp.asarray(t_prev) < 0).reshape(shape)
    stepped = jnp.sqrt(a_prev) * denoised + jnp.sqrt(1 - a_prev) * noise
    return jnp.where(is_last, denoised, stepped)
