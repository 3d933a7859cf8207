"""Img2img (refiner) and inpainting samplers.

  * `img2img` — strength-truncated denoise from a noised source latent:
    the SDXL refiner pass (reference pipeline.py:358-359,
    `piperf(image, prompt, strength=refinement)`).
  * `inpaint` — 9-channel SDXL inpainting (reference pipeline.py:132-139
    builds the inpaint pipe from shared base components;
    gdino/lib.py:85-102 drives it in IP-Adapter local mode): latent +
    downsampled mask + masked-image latent concatenated per step via
    the sampler's `extra_channels` hook.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models import unet as unet_lib
from ..core.prng import row_normal
from .sampler import make_cfg_eps_fn, scan_denoise
from .schedulers import Schedule


def img2img_timesteps(schedule: Schedule, num_inference_steps: int, strength: float):
    """diffusers img2img: keep the last `strength·N` timesteps."""
    ts = schedule.timesteps(num_inference_steps)
    init_t = min(int(num_inference_steps * strength), num_inference_steps)
    t_start = max(num_inference_steps - init_t, 0)
    return ts[t_start:], int(num_inference_steps - t_start)


def img2img(
    unet_params,
    unet_cfg: unet_lib.UNetConfig,
    schedule: Schedule,
    src_latents: jax.Array,
    key: jax.Array,
    ctx: jax.Array,
    ctx_uncond: jax.Array,
    pooled: jax.Array,
    pooled_uncond: jax.Array,
    time_ids: jax.Array,
    num_inference_steps: int = 25,
    strength: float = 0.5,
    guidance_scale: float = 7.5,
    ip_tokens: Optional[jax.Array] = None,
    ip_tokens_uncond: Optional[jax.Array] = None,
    ip_scale: float = 1.0,
    time_ids_uncond: Optional[jax.Array] = None,
) -> jax.Array:
    ts, n = img2img_timesteps(schedule, num_inference_steps, strength)
    if n == 0:
        return src_latents
    # key may be (B,) keys: per-row-deterministic noise for batched serving
    noise = row_normal(key, src_latents.shape)
    lat = schedule.add_noise(
        src_latents.astype(jnp.float32), noise, jnp.full((src_latents.shape[0],), ts[0])
    ).astype(src_latents.dtype)
    eps_fn = make_cfg_eps_fn(
        unet_params, unet_cfg, ctx, ctx_uncond, pooled, pooled_uncond, time_ids,
        guidance_scale, ip_tokens, ip_tokens_uncond, ip_scale,
        time_ids_uncond=time_ids_uncond,
    )
    return scan_denoise(eps_fn, schedule, lat, ts)


def inpaint(
    unet_params,
    unet_cfg: unet_lib.UNetConfig,  # in_channels == 9
    schedule: Schedule,
    src_latents: jax.Array,  # (B, h, w, 4) clean scaled latents
    mask: jax.Array,  # (B, H, W, 1) in [0,1] — 1 = repaint region
    masked_latents: jax.Array,  # (B, h, w, 4) latents of masked image
    key: jax.Array,
    ctx: jax.Array,
    ctx_uncond: jax.Array,
    pooled: jax.Array,
    pooled_uncond: jax.Array,
    time_ids: jax.Array,
    num_inference_steps: int = 50,
    strength: float = 0.7,
    guidance_scale: float = 7.5,
    ip_tokens: Optional[jax.Array] = None,
    ip_tokens_uncond: Optional[jax.Array] = None,
    ip_scale: float = 1.0,
) -> jax.Array:
    b, h, w, _ = src_latents.shape
    mask_lat = jax.image.resize(mask.astype(jnp.float32), (b, h, w, 1), "nearest")
    ts, n = img2img_timesteps(schedule, num_inference_steps, strength)
    if n == 0:
        return src_latents
    noise = row_normal(key, src_latents.shape)
    lat = schedule.add_noise(
        src_latents.astype(jnp.float32), noise, jnp.full((b,), ts[0])
    ).astype(src_latents.dtype)
    if unet_cfg.in_channels == 9:
        # dedicated inpaint UNet: mask + masked-image latents concat
        extra = jnp.concatenate(
            [mask_lat.astype(lat.dtype), masked_latents.astype(lat.dtype)], axis=-1
        )
        eps_fn = make_cfg_eps_fn(
            unet_params, unet_cfg, ctx, ctx_uncond, pooled, pooled_uncond,
            time_ids, guidance_scale, ip_tokens, ip_tokens_uncond, ip_scale,
            extra_channels=extra,
        )
        return scan_denoise(eps_fn, schedule, lat, ts)
    # base 4-channel UNet — the reference's LIVE inpaint path: its
    # StableDiffusionXLInpaintPipeline shares the base UNet (reference
    # pipeline.py:132-139), and diffusers with num_channels_unet==4
    # resets the keep region after every scheduler step to the source
    # latents noised to the NEXT timestep (same `noise` sample).
    eps_fn = make_cfg_eps_fn(
        unet_params, unet_cfg, ctx, ctx_uncond, pooled, pooled_uncond,
        time_ids, guidance_scale, ip_tokens, ip_tokens_uncond, ip_scale,
    )
    src32 = src_latents.astype(jnp.float32)
    ts_prev = jnp.concatenate([ts[1:], jnp.asarray([-1], jnp.int32)])

    def step(cur, inputs):
        t, t_prev, i = inputs
        eps = eps_fn(cur, t, i)
        nxt = schedule.ddim_step(
            eps.astype(jnp.float32), jnp.full((b,), t), jnp.full((b,), t_prev),
            cur.astype(jnp.float32),
        )
        init_proper = jnp.where(
            t_prev >= 0,
            schedule.add_noise(
                src32, noise, jnp.full((b,), jnp.maximum(t_prev, 0))
            ),
            src32,
        )
        nxt = (1.0 - mask_lat) * init_proper + mask_lat * nxt
        return nxt.astype(src_latents.dtype), None

    out, _ = jax.lax.scan(
        step, lat, (ts, ts_prev, jnp.arange(ts.shape[0]))
    )
    return out
