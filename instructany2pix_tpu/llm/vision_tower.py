"""Vision towers for the LLM — CLIP feature extraction surface.

Rebuild of reference llm/model/multimodal_encoder/ (clip_encoder.py,
image_bind_encoder.py, builder.py): a tower wraps a vision encoder and
exposes `select_feature ∈ {patch, cls_patch, projection}`
(clip_encoder.py:29-39). Note the reference tower short-circuits dict
inputs to zeros at runtime (clip_encoder.py:50) — multimodal context
enters through the `extra_replacement` splice instead — so the tower
here is the *capability* surface for vision-in-context training, not a
hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import clip as clip_lib


@dataclasses.dataclass(frozen=True)
class VisionTowerConfig:
    select_feature: str = "patch"  # patch | cls_patch | projection
    select_layer: int = -2
    clip: clip_lib.CLIPVisionConfig = clip_lib.CLIPVisionConfig.vit_h()

    @staticmethod
    def tiny() -> "VisionTowerConfig":
        return VisionTowerConfig(clip=clip_lib.CLIPVisionConfig.tiny())


def init(key, cfg: VisionTowerConfig):
    return clip_lib.vision_init(key, cfg.clip)


def apply(params, pixels: Optional[jax.Array], cfg: VisionTowerConfig, batch: int = 1):
    """pixels (B, H, W, 3) → features. None input returns zeros like the
    reference's dict short-circuit (clip_encoder.py:50)."""
    if pixels is None:
        dim = (
            cfg.clip.projection_dim
            if cfg.select_feature == "projection"
            else cfg.clip.hidden_size
        )
        return jnp.zeros((batch, 1, dim))
    out = clip_lib.vision_apply(params, pixels, cfg.clip)
    if cfg.select_feature == "projection":
        return out["image_embeds"][:, None, :]
    hidden = out["hidden_states"][cfg.select_layer]
    if cfg.select_feature == "patch":
        return hidden[:, 1:]
    if cfg.select_feature == "cls_patch":
        return hidden
    raise ValueError(cfg.select_feature)


def build_vision_tower(name: str, key, **kwargs):
    """Dispatch on tower name (reference multimodal_encoder/builder.py:
    openai/laion paths → CLIP; languagebind → ImageBind-class)."""
    name = name or ""
    if "languagebind" in name.lower():
        from ..models import imagebind

        cfg = imagebind.ViTConfig.imagebind_vision()
        return imagebind.init(key, cfg), cfg
    cfg = VisionTowerConfig(**kwargs)
    return init(key, cfg), cfg
