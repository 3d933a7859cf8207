"""Plug-and-play structural editing — a WORKING version of the
reference's stubbed `SDXLPNPPipeline` (reference ddim/pnp_pipeline.py:
281-530, whose `feature_bags` capture/inject mechanism is an empty
scaffold).

Method (pnp-diffusion-features): DDIM-invert the source image, then
denoise a 3-row batch [source-replay, edit-uncond, edit-cond] in ONE
scan where the up-block self-attentions of every row use the SOURCE
row's Q/K (`unet.apply(pnp_share_qk=True)`) for the first
`injection_ratio` of steps — the edit inherits the source's spatial
structure while its values/content follow the edit prompt. TPU-native:
no hooks or feature bags; the sharing is a static graph flag and the
whole loop is one `lax.scan`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import unet as unet_lib
from .sampler import scan_denoise
from .schedulers import Schedule


def pnp_denoise(
    unet_params,
    unet_cfg: unet_lib.UNetConfig,
    schedule: Schedule,
    inverted_latents: jax.Array,  # (1, h, w, 4) from ddim_invert
    ctx: jax.Array,  # (1, S, D) edit prompt embeds
    ctx_uncond: jax.Array,
    ctx_src: jax.Array,  # (1, S, D) source/null prompt embeds
    pooled: jax.Array,
    pooled_uncond: jax.Array,
    pooled_src: jax.Array,
    time_ids: jax.Array,  # (1, n)
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    injection_ratio: float = 0.8,
) -> jax.Array:
    """→ (1, h, w, 4) edited latents. The source row replays its own
    denoising from the inverted latents (prompt = `ctx_src`), providing
    the shared self-attention Q/K during the injection window."""
    ts = schedule.timesteps(num_inference_steps)
    n_inject = int(injection_ratio * num_inference_steps)

    ctx3 = jnp.concatenate([ctx_src, ctx_uncond, ctx], axis=0)
    pooled3 = jnp.concatenate([pooled_src, pooled_uncond, pooled], axis=0)
    tid3 = jnp.tile(time_ids, (3, 1))
    cross_kv = unet_lib.precompute_cross_kv(unet_params, unet_cfg, ctx3, None)

    def eps_fn(lat, t, i):
        # lat carries [source, edit]; the UNet batch is
        # [source, edit-uncond, edit-cond]
        lat3 = jnp.concatenate([lat[0:1], lat[1:2], lat[1:2]], axis=0)

        # one forward per variant of the pnp flag; lax.cond keeps both
        # branches compiled once and picks by step index
        def run(share):
            return unet_lib.apply(
                unet_params, lat3, jnp.broadcast_to(t, (3,)), ctx3, unet_cfg,
                pooled_text=pooled3, time_ids=tid3, cross_kv=cross_kv,
                pnp_share_qk=share,
            )

        eps3 = jax.lax.cond(i < n_inject, lambda: run(True), lambda: run(False))
        eps_src = eps3[0:1]
        eps_u, eps_c = eps3[1:2], eps3[2:3]
        eps_edit = eps_u + guidance_scale * (eps_c - eps_u)
        return jnp.concatenate([eps_src, eps_edit], axis=0)

    lat0 = jnp.concatenate([inverted_latents, inverted_latents], axis=0)
    out = scan_denoise(eps_fn, schedule, lat0, ts)
    return out[1:2]
