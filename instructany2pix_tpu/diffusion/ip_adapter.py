"""IP-Adapter conditioning: 2-view global/local image projection.

Rebuild of the reference's modified `ImageProjModel` (reference
diffusion/ip_adapter/ip_adapter.py:28-67) and the embed-preparation
half of `IPAdapter.get_image_embeds` (ip_adapter.py:171-209). The
attention half (separate to_k_ip/to_v_ip per cross-attn layer +
scaled add, reference attention_processor.py:82-173) lives inside the
UNet as the `ip` param subtree — see models/unet.py.

Semantics preserved exactly:
  * stacked [global, local] 1024-d embeddings project to
    `num_crops × num_tokens` context tokens of the UNet's
    cross-attention dim;
  * local tokens blend with global by `scales[1]`:
    local = global·(1−s_l) + local·s_l;
  * learned per-view `raw_embed` position embeddings;
  * view subset by mode ∈ {global, local, both}; LayerNorm last;
  * unconditional tokens come from zero image embeds with default
    scales.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from ..models import layers as L


@dataclasses.dataclass(frozen=True)
class ImageProjConfig:
    cross_attention_dim: int = 2048  # SDXL UNet context dim
    clip_embeddings_dim: int = 1024  # ImageBind / CLIP-H embed dim
    num_tokens: int = 4  # clip_extra_context_tokens
    num_crops: int = 2  # [global, local]

    @staticmethod
    def tiny(cross_attention_dim=32, clip_embeddings_dim=16) -> "ImageProjConfig":
        return ImageProjConfig(cross_attention_dim, clip_embeddings_dim)


def init(key, cfg: ImageProjConfig = ImageProjConfig()):
    kc = KeyChain(key)
    return {
        "proj": L.linear_init(
            kc(), cfg.clip_embeddings_dim, cfg.num_tokens * cfg.cross_attention_dim
        ),
        "norm": L.layer_norm_init(cfg.cross_attention_dim),
        "raw_embed": jnp.zeros((2, cfg.cross_attention_dim)),
    }


def apply(
    params,
    image_embeds: jax.Array,  # (B, 2, clip_embeddings_dim) [global, local]
    cfg: ImageProjConfig = ImageProjConfig(),
    mode: str = "global",
    scales: Tuple[float, float] = (1.0, 1.0),
) -> jax.Array:
    b = image_embeds.shape[0]
    tok = L.linear(params["proj"], image_embeds).reshape(
        b, cfg.num_crops, cfg.num_tokens, cfg.cross_attention_dim
    )
    g, l = tok[:, :1], tok[:, 1:]
    l = g * (1.0 - scales[1]) + l * scales[1]
    g = g + params["raw_embed"][0][None, None]
    l = l + params["raw_embed"][1][None, None]
    if mode == "global":
        tok = g
    elif mode == "local":
        tok = l
    elif mode == "both":
        tok = jnp.concatenate([g, l], axis=1)
    else:
        raise ValueError(f"Invalid Mode {mode}")
    tok = tok.reshape(b, -1, cfg.cross_attention_dim)
    return L.layer_norm(params["norm"], tok)


CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_clip_image(image, image_size: int = 224) -> jax.Array:
    """CLIPImageProcessor semantics (the reference's
    `clip_image_processor`, ip_adapter.py:99,179): shortest-side resize,
    center crop, rescale to [0,1], CLIP mean/std normalize. Accepts one
    HWC uint8/float array or a list of them; returns (B, H, W, 3)."""
    import numpy as np

    from ..codecs import image_io

    if not isinstance(image, (list, tuple)):
        image = [image]
    out = []
    for img in image:
        arr = np.asarray(img)
        # dtype, not value range, decides rescaling — a near-black uint8
        # image (max ≤ 1) must still be divided by 255
        is_int = np.issubdtype(arr.dtype, np.integer)
        arr = image_io.resize_center_crop(arr, image_size).astype(np.float32)
        if is_int:
            arr = arr / 255.0
        arr = (arr - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
        out.append(arr)
    return jnp.asarray(np.stack(out), jnp.float32)


def encode_clip_image(vision_params, vision_cfg, image) -> jax.Array:
    """image(s) → projected CLIP image embeds — the reference's h94
    image-encoder path (`self.image_encoder(...).image_embeds`,
    ip_adapter.py:180)."""
    from ..models import clip as clip_lib

    pixels = preprocess_clip_image(image, vision_cfg.image_size)
    out = clip_lib.vision_apply(vision_params, pixels, vision_cfg)
    return out["image_embeds"]


def get_image_embeds(
    params,
    cfg: ImageProjConfig,
    clip_image_embeds: Optional[jax.Array] = None,  # (B, D) global
    clip_image_embeds_local: Optional[jax.Array] = None,  # (B, D) local
    mode: str = "global",
    scale_g: float = 1.0,
    scale_l: float = 1.0,
    image=None,  # raw image(s) → encoded via image_encoder
    image_local=None,
    image_encoder: Optional[tuple] = None,  # (vision_params, vision_cfg)
) -> Tuple[jax.Array, jax.Array]:
    """→ (cond_tokens, uncond_tokens), reference ip_adapter.py:171-209.
    Raw images run through the CLIP image encoder when given (the
    reference's `pil_image`/`pil_image_local` path); a missing view is
    zero-filled; uncond always projects zeros."""
    if image is not None:
        assert image_encoder is not None, "image input needs image_encoder"
        clip_image_embeds = encode_clip_image(*image_encoder, image)
    if image_local is not None:
        assert image_encoder is not None, "image input needs image_encoder"
        clip_image_embeds_local = encode_clip_image(*image_encoder, image_local)
    if clip_image_embeds is None:
        assert clip_image_embeds_local is not None
        clip_image_embeds = jnp.zeros_like(clip_image_embeds_local)
    if clip_image_embeds_local is None:
        clip_image_embeds_local = jnp.zeros_like(clip_image_embeds)
    stacked = jnp.stack([clip_image_embeds, clip_image_embeds_local], axis=1)
    cond = apply(params, stacked, cfg, mode=mode, scales=(scale_g, scale_l))
    uncond = apply(params, jnp.zeros_like(stacked), cfg, mode=mode)
    return cond, uncond


# -------------------------------------------------------------- converter


def convert_image_proj_from_torch(sd: dict) -> dict:
    """`image_proj` half of the ip_adapter checkpoint (reference
    ip_adapter.py:155-169 loads {"image_proj","ip_adapter"})."""
    from ..core import checkpoint as ckpt

    return {
        "proj": {"w": ckpt.linear_w(sd["proj.weight"]), "b": sd["proj.bias"]},
        "norm": {"g": sd["norm.weight"], "b": sd["norm.bias"]},
        "raw_embed": sd["raw_embed"],
    }


def convert_ip_attn_from_torch(sd: dict, attn_paths: list) -> dict:
    """`ip_adapter` half: the reference stores per-processor
    `{i}.to_k_ip.weight/to_v_ip.weight` keyed by the UNet's
    attn_processors iteration order (reference ip_adapter.py:167-169).
    `attn_paths` is our UNet's cross-attn param paths in that same
    traversal order; returns {path: {"to_k_ip": w, "to_v_ip": w}}."""
    from ..core import checkpoint as ckpt

    out = {}
    for i, path in enumerate(attn_paths):
        out[path] = {
            "to_k_ip": {"w": ckpt.linear_w(sd[f"{2 * i + 1}.to_k_ip.weight"])},
            "to_v_ip": {"w": ckpt.linear_w(sd[f"{2 * i + 1}.to_v_ip.weight"])},
        }
    return out


# ------------------------------------------------- plain MLP projector


def mlp_proj_init(key, clip_embeddings_dim: int = 1024, cross_attention_dim: int = 1024):
    """MLPProjModel (reference ip_adapter.py:77-92, IPAdapterFull):
    Linear → GELU → Linear → LayerNorm over per-token features."""
    kc = KeyChain(key)
    return {
        "fc1": L.linear_init(kc(), clip_embeddings_dim, clip_embeddings_dim),
        "fc2": L.linear_init(kc(), clip_embeddings_dim, cross_attention_dim),
        "norm": L.layer_norm_init(cross_attention_dim),
    }


def mlp_proj_apply(params, image_embeds):
    h = L.linear(params["fc2"], L.gelu(L.linear(params["fc1"], image_embeds)))
    return L.layer_norm(params["norm"], h)


def aggregate_attn_maps(taps: dict, image_hw, batch_index: int = 1):
    """Reference `get_net_attn_map` (ip_adapter/utils.py:46-59): per
    layer take one CFG half, mean over heads, reshape pixel axis to its
    2D grid, bilinear-upscale to `image_hw`, softmax over the n_ip axis,
    then mean across layers. `taps` comes from
    `unet.apply(..., capture_ip_attn=True)`."""
    import jax

    th, tw = image_hw
    per_layer = []
    for probs in taps.values():  # (B, heads, S, n_ip)
        m = jnp.mean(probs[batch_index].astype(jnp.float32), axis=0)  # (S, n_ip)
        s, n_ip = m.shape
        # infer the layer's square grid from the pixel count
        side = int(round(s**0.5))
        if side * side != s:
            continue
        grid = m.T.reshape(n_ip, side, side)
        up = jax.image.resize(grid, (n_ip, th, tw), "bilinear")
        per_layer.append(jax.nn.softmax(up, axis=0))
    if not per_layer:
        return None
    return jnp.mean(jnp.stack(per_layer), axis=0)  # (n_ip, H, W)
