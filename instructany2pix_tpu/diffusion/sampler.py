"""SDXL sampling graphs: CFG denoise scan, DDIM inversion scan, prompt
encoding, latent mixing.

TPU-native replacements for the reference's Python denoise loops:
  * `denoise` — the StableDiffusionXL(Custom)Pipeline loop (reference
    diffusion/ip_adapter/custom_pipelines.py:325-330 incl. the
    IP-scale step window) as one `lax.scan`, CFG via a 2B-batched UNet
    call like diffusers.
  * `ddim_invert` — `SDXLDDIMPipeline.inverse` (reference
    ddim/pnp_pipeline.py:88-278): prompt-only (no CFG) UNet pass per
    ascending timestep, exact reverse-DDIM update.
  * `encode_prompt_sdxl` — two-encoder SDXL prompt embedding
    (penultimate hidden states concat, pooled from encoder 2).
  * `polar_interpolate` — norm-preserving latent interpolation
    (reference pipeline.py:295-300 `polar_intrtpolate`).
  * `mix_latents` — the h0/h1/h2 conditioning mix + renorm
    (reference pipeline.py:322-324).

The scan cores (`scan_denoise`/`scan_invert`) take a plain
`eps_fn(lat, t, i) -> eps` so samplers compose with any conditioning
wrapper (CFG, IP windows, inpaint channel concat) and are exactly
testable against analytic models.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import clip as clip_lib
from ..models import unet as unet_lib
from .schedulers import Schedule


def encode_prompt_sdxl(
    text1_params,
    text1_cfg: clip_lib.CLIPTextConfig,
    text2_params,
    text2_cfg: clip_lib.CLIPTextConfig,
    ids1: jax.Array,  # (B, 77) tokenizer-1 ids
    ids2: jax.Array,  # (B, 77) tokenizer-2 ids
) -> Tuple[jax.Array, jax.Array]:
    """→ (prompt_embeds (B,77,768+1280), pooled (B,1280)). SDXL uses the
    penultimate hidden state of both encoders; pooled text comes from
    encoder 2's projection."""
    o1 = clip_lib.text_apply(text1_params, ids1, text1_cfg)
    o2 = clip_lib.text_apply(text2_params, ids2, text2_cfg)
    h = jnp.concatenate([o1["hidden_states"][-2], o2["hidden_states"][-2]], axis=-1)
    pooled = o2.get("text_embeds", o2["pooled"])
    return h, pooled


def default_time_ids(h: int, w: int, batch: int) -> jax.Array:
    """SDXL added-cond time ids: (orig_h, orig_w, crop_t, crop_l, tgt_h,
    tgt_w)."""
    return jnp.tile(jnp.asarray([[h, w, 0, 0, h, w]], jnp.float32), (batch, 1))


# ------------------------------------------------------------- scan cores


def scan_denoise(
    eps_fn: Callable,
    schedule: Schedule,
    latents: jax.Array,
    ts: jax.Array,  # descending inference timesteps
) -> jax.Array:
    """x_T → x_0 DDIM scan; eps_fn(lat, t, i) returns ε at (lat, t)."""
    n = ts.shape[0]
    ts_prev = jnp.concatenate([ts[1:], jnp.asarray([-1], jnp.int32)])
    b = latents.shape[0]

    def step(lat, inputs):
        t, t_prev, i = inputs
        eps = eps_fn(lat, t, i)
        lat = schedule.ddim_step(
            eps.astype(jnp.float32),
            jnp.full((b,), t),
            jnp.full((b,), t_prev),
            lat.astype(jnp.float32),
        ).astype(latents.dtype)
        return lat, None

    out, _ = jax.lax.scan(step, latents, (ts, ts_prev, jnp.arange(n)))
    return out


def scan_invert(
    eps_fn: Callable,
    schedule: Schedule,
    latents: jax.Array,
    ts: jax.Array,  # ASCENDING timesteps
) -> jax.Array:
    """x_0 → x_T exact reverse-DDIM scan (reference
    ddim/pnp_pipeline.py:251-275: ε evaluated at the target timestep)."""
    ts_prev = jnp.concatenate([jnp.asarray([-1], jnp.int32), ts[:-1]])
    b = latents.shape[0]

    def step(lat, inputs):
        t, t_prev, i = inputs
        eps = eps_fn(lat, t, i)
        lat = schedule.ddim_inverse_step(
            eps.astype(jnp.float32),
            jnp.full((b,), t_prev),
            jnp.full((b,), t),
            lat.astype(jnp.float32),
        ).astype(latents.dtype)
        return lat, None

    out, _ = jax.lax.scan(step, latents, (ts, ts_prev, jnp.arange(ts.shape[0])))
    return out


# --------------------------------------------------------- CFG UNet eps_fn


def make_cfg_eps_fn(
    unet_params,
    unet_cfg: unet_lib.UNetConfig,
    ctx: jax.Array,
    ctx_uncond: Optional[jax.Array],
    pooled: jax.Array,
    pooled_uncond: Optional[jax.Array],
    time_ids: jax.Array,
    guidance_scale: float = 1.0,
    ip_tokens: Optional[jax.Array] = None,
    ip_tokens_uncond: Optional[jax.Array] = None,
    ip_scale: float = 1.0,
    ip_step_window: Optional[Tuple[int, int]] = None,
    extra_channels: Optional[jax.Array] = None,  # inpaint mask+masked latents
    time_ids_uncond: Optional[jax.Array] = None,
) -> Callable:
    """Build eps_fn wrapping the UNet with classifier-free guidance
    (uncond first, diffusers order), optional IP tokens with a step
    window, and optional per-step channel concat (inpainting).
    `time_ids_uncond` covers the refiner's aesthetic-score asymmetry
    (diffusers _get_add_time_ids: 6.0 cond / 2.5 uncond)."""
    do_cfg = guidance_scale > 1.0
    mult = 2 if do_cfg else 1

    def dup(c, u):
        return jnp.concatenate([u, c], axis=0) if do_cfg else c

    ctx2 = dup(ctx, ctx_uncond)
    pooled2 = dup(pooled, pooled_uncond)
    if do_cfg and time_ids_uncond is not None:
        tid2 = jnp.concatenate([time_ids_uncond, time_ids], axis=0)
    else:
        tid2 = jnp.tile(time_ids, (mult, 1))
    if ip_tokens is not None:
        ipu = (
            ip_tokens_uncond
            if ip_tokens_uncond is not None
            else jnp.zeros_like(ip_tokens)
        )
        ip2 = dup(ip_tokens, ipu)
    else:
        ip2 = None
    extra2 = (
        jnp.tile(extra_channels, (mult, 1, 1, 1)) if extra_channels is not None else None
    )
    # the context is constant across the whole scan: project it through
    # every cross-attention's to_k/to_v (and to_k_ip/to_v_ip) once here
    # instead of per step per layer (models/unet.py precompute_cross_kv)
    cross_kv = unet_lib.precompute_cross_kv(unet_params, unet_cfg, ctx2, ip2)

    def eps_fn(lat, t, i):
        lat_in = jnp.tile(lat, (mult, 1, 1, 1))
        if extra2 is not None:
            lat_in = jnp.concatenate([lat_in, extra2], axis=-1)
        if ip_step_window is not None:
            lo, hi = ip_step_window
            scale_i = jnp.where((i >= lo) & (i < hi), ip_scale, 0.0)
        else:
            scale_i = ip_scale
        eps = unet_lib.apply(
            unet_params,
            lat_in,
            jnp.broadcast_to(t, (lat_in.shape[0],)),
            ctx2,
            unet_cfg,
            pooled_text=pooled2,
            time_ids=tid2,
            ip_tokens=ip2,
            ip_scale=scale_i,
            cross_kv=cross_kv,
        )
        if do_cfg:
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        return eps

    return eps_fn


# ------------------------------------------------------------- public API


def denoise(
    unet_params,
    unet_cfg: unet_lib.UNetConfig,
    schedule: Schedule,
    latents: jax.Array,
    ctx: jax.Array,
    ctx_uncond: jax.Array,
    pooled: jax.Array,
    pooled_uncond: jax.Array,
    time_ids: jax.Array,
    num_inference_steps: int = 25,
    guidance_scale: float = 10.0,
    ip_tokens: Optional[jax.Array] = None,
    ip_tokens_uncond: Optional[jax.Array] = None,
    ip_scale: float = 1.0,
    ip_window: Tuple[float, float] = (0.0, 1.0),
) -> jax.Array:
    """CFG denoise loop. `ip_window` replicates
    control_guidance_start/end (reference custom_pipelines.py:325-330)."""
    ts = schedule.timesteps(num_inference_steps)
    eps_fn = make_cfg_eps_fn(
        unet_params,
        unet_cfg,
        ctx,
        ctx_uncond,
        pooled,
        pooled_uncond,
        time_ids,
        guidance_scale,
        ip_tokens,
        ip_tokens_uncond,
        ip_scale,
        ip_step_window=(
            int(ip_window[0] * num_inference_steps),
            int(ip_window[1] * num_inference_steps),
        ),
    )
    return scan_denoise(eps_fn, schedule, latents, ts)


def ddim_invert(
    unet_params,
    unet_cfg: unet_lib.UNetConfig,
    schedule: Schedule,
    latents: jax.Array,
    ctx: jax.Array,
    pooled: jax.Array,
    time_ids: jax.Array,
    num_inference_steps: int = 25,
) -> jax.Array:
    """Push clean latents to noise (no CFG — prompt encoded with
    guidance off, reference pnp_pipeline.py:161)."""
    ts = schedule.timesteps(num_inference_steps)[::-1]
    eps_fn = make_cfg_eps_fn(
        unet_params, unet_cfg, ctx, None, pooled, None, time_ids, guidance_scale=1.0
    )
    return scan_invert(eps_fn, schedule, latents, ts)


def polar_interpolate(x: jax.Array, y: jax.Array, alpha: float) -> jax.Array:
    """Norm-preserving interpolation between inverted latents x and
    Gaussian noise y: direction of αx+(1−α)y, magnitude α‖x‖+(1−α)‖y‖
    (reference pipeline.py:295-300)."""
    xf, yf = x.astype(jnp.float32), y.astype(jnp.float32)
    ll = alpha * xf + (1 - alpha) * yf
    nx = jnp.linalg.norm(xf.reshape(-1))
    ny = jnp.linalg.norm(yf.reshape(-1))
    nl = jnp.linalg.norm(ll.reshape(-1))
    out = ll / (nl + 1e-9) * (alpha * nx + (1 - alpha) * ny)
    return out.astype(x.dtype)


def mix_latents(
    base_embed: jax.Array,
    image_embeds: jax.Array,
    prior_embed: jax.Array,
    h: Tuple[float, float, float] = (0.0, 0.4, 1.0),
    norm: float = 20.0,
) -> jax.Array:
    """Conditioning-embedding mix `h0·base + h1·llm + h2·20·prior`,
    renormalized to `norm` (reference pipeline.py:322-324)."""
    la = (
        h[0] * base_embed.astype(jnp.float32)
        + h[1] * image_embeds.astype(jnp.float32)
        + h[2] * 20.0 * prior_embed.astype(jnp.float32)
    )
    la = la / (jnp.linalg.norm(la, axis=-1, keepdims=True) + 1e-9) * norm
    return la


def scan_denoise_lcm(eps_fn, schedule: Schedule, latents: jax.Array, ts, key):
    """LCM consistency sampling scan (4-step fast path; needs distilled
    UNet weights for quality — the stepping is weight-agnostic)."""
    from .schedulers import lcm_step

    ts = jnp.asarray(ts)
    ts_prev = jnp.concatenate([ts[1:], jnp.asarray([-1], jnp.int32)])
    b = latents.shape[0]
    keys = jax.random.split(key, ts.shape[0])

    def step(lat, inputs):
        t, t_prev, k, i = inputs
        eps = eps_fn(lat, t, i)
        lat = lcm_step(
            schedule,
            eps.astype(jnp.float32),
            jnp.full((b,), t),
            jnp.full((b,), t_prev),
            lat.astype(jnp.float32),
            key=k,
        ).astype(latents.dtype)
        return lat, None

    out, _ = jax.lax.scan(
        step, latents, (ts, ts_prev, keys, jnp.arange(ts.shape[0]))
    )
    return out
