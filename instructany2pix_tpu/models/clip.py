"""CLIP text/vision encoders — config-driven, pure-functional.

One implementation covers every CLIP in the reference stack:
  * SDXL text encoder 1 (CLIP ViT-L/14, 768-d, quick_gelu) and
    text encoder 2 (OpenCLIP bigG, 1280-d, gelu) — prompt encoding for
    the UNet (reference diffusion pipelines / pipeline.py:101-116);
    SDXL consumes penultimate hidden states and the pooled projection
    of encoder 2.
  * CLIP-ViT-H text — the prior's conditioner returning hidden states
    + attention mask (reference prior/model.py:20-105).
  * CLIP vision with projection — IP-Adapter image encoder (reference
    diffusion/ip_adapter/ip_adapter.py:99,171-209) and the LLM's
    CLIPVisionTower surface (reference
    llm/model/multimodal_encoder/clip_encoder.py).

Weight import: `convert_text_from_hf` / `convert_vision_from_hf` map
HF `transformers` CLIP state dicts (torch) into these pytrees; parity
is tested against `transformers.CLIPTextModel` on random tiny configs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.prng import KeyChain
from ..ops.attention import dot_product_attention
from . import layers as L


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    hidden_act: str = "quick_gelu"
    projection_dim: Optional[int] = None  # text_projection if set
    eos_token_id: int = 49407

    @staticmethod
    def vit_l() -> "CLIPTextConfig":
        return CLIPTextConfig(projection_dim=768)

    @staticmethod
    def open_clip_bigg() -> "CLIPTextConfig":
        return CLIPTextConfig(
            hidden_size=1280,
            intermediate_size=5120,
            num_layers=32,
            num_heads=20,
            hidden_act="gelu",
            projection_dim=1280,
        )

    @staticmethod
    def vit_h() -> "CLIPTextConfig":
        return CLIPTextConfig(
            hidden_size=1024,
            intermediate_size=4096,
            num_layers=24,
            num_heads=16,
            hidden_act="gelu",
            projection_dim=1024,
        )

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_layers=2,
            num_heads=4,
            max_positions=16,
            eos_token_id=127,
        )


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: Optional[int] = 1024
    hidden_act: str = "gelu"

    @staticmethod
    def vit_h() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            hidden_size=32,
            intermediate_size=64,
            num_layers=2,
            num_heads=4,
            image_size=28,
            patch_size=14,
            projection_dim=16,
        )


def _act(name):
    return {"quick_gelu": L.quick_gelu, "gelu": L.gelu}[name]


def _layer_init(kc, dim, inter):
    return {
        "ln1": L.layer_norm_init(dim),
        "q": L.linear_init(kc(), dim, dim),
        "k": L.linear_init(kc(), dim, dim),
        "v": L.linear_init(kc(), dim, dim),
        "o": L.linear_init(kc(), dim, dim),
        "ln2": L.layer_norm_init(dim),
        "fc1": L.linear_init(kc(), dim, inter),
        "fc2": L.linear_init(kc(), inter, dim),
    }


def _layer(p, x, heads, act, causal, mask=None):
    b, s, d = x.shape
    hd = d // heads
    h = L.layer_norm(p["ln1"], x)
    q = L.linear(p["q"], h).reshape(b, s, heads, hd)
    k = L.linear(p["k"], h).reshape(b, s, heads, hd)
    v = L.linear(p["v"], h).reshape(b, s, heads, hd)
    o = dot_product_attention(q, k, v, causal=causal, mask=mask, impl="xla")
    x = x + L.linear(p["o"], o.reshape(b, s, d))
    h = L.layer_norm(p["ln2"], x)
    x = x + L.linear(p["fc2"], act(L.linear(p["fc1"], h)))
    return x


# ------------------------------------------------------------------- text


def text_init(key, cfg: CLIPTextConfig):
    kc = KeyChain(key)
    p = {
        "token_embedding": L.embedding_init(kc(), cfg.vocab_size, cfg.hidden_size),
        "position_embedding": L.embedding_init(kc(), cfg.max_positions, cfg.hidden_size),
        "final_ln": L.layer_norm_init(cfg.hidden_size),
    }
    for i in range(cfg.num_layers):
        p[f"layer_{i}"] = _layer_init(kc, cfg.hidden_size, cfg.intermediate_size)
    if cfg.projection_dim:
        p["text_projection"] = L.linear_init(
            kc(), cfg.hidden_size, cfg.projection_dim, bias=False
        )
    return p


def text_apply(
    params,
    input_ids: jax.Array,  # (B, S) int32
    cfg: CLIPTextConfig,
    attention_mask: Optional[jax.Array] = None,
):
    """Returns dict with `hidden_states` (tuple incl. embeddings and every
    layer output), `last_hidden_state` (final-LN applied), `pooled`
    (EOS-position hidden after final LN), `text_embeds` (projected pooled
    if the config has a projection)."""
    b, s = input_ids.shape
    x = L.embedding(params["token_embedding"], input_ids)
    pos = jnp.arange(s)
    x = x + L.embedding(params["position_embedding"], pos)[None]
    act = _act(cfg.hidden_act)
    hidden = [x]
    for i in range(cfg.num_layers):
        x = _layer(params[f"layer_{i}"], x, cfg.num_heads, act, causal=True, mask=attention_mask)
        hidden.append(x)
    last = L.layer_norm(params["final_ln"], x)
    # CLIP pools at the first EOS token position (HF uses eos_token_id
    # match; falls back to argmax for custom vocabs)
    is_eos = (input_ids == cfg.eos_token_id).astype(jnp.int32)
    has_eos = jnp.any(is_eos, axis=1)
    eos_pos = jnp.where(has_eos, jnp.argmax(is_eos, axis=1), s - 1)
    pooled = last[jnp.arange(b), eos_pos]
    out = {
        "hidden_states": tuple(hidden),
        "last_hidden_state": last,
        "pooled": pooled,
    }
    if "text_projection" in params:
        out["text_embeds"] = L.linear(params["text_projection"], pooled)
    return out


# ----------------------------------------------------------------- vision


def vision_init(key, cfg: CLIPVisionConfig):
    kc = KeyChain(key)
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    p = {
        "patch_embedding": {
            "w": jax.random.normal(
                kc(), (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size)
            )
            * 0.02
        },
        "class_embedding": jax.random.normal(kc(), (cfg.hidden_size,)) * 0.02,
        "position_embedding": L.embedding_init(kc(), n_patches + 1, cfg.hidden_size),
        "pre_ln": L.layer_norm_init(cfg.hidden_size),
        "post_ln": L.layer_norm_init(cfg.hidden_size),
    }
    for i in range(cfg.num_layers):
        p[f"layer_{i}"] = _layer_init(kc, cfg.hidden_size, cfg.intermediate_size)
    if cfg.projection_dim:
        p["visual_projection"] = L.linear_init(
            kc(), cfg.hidden_size, cfg.projection_dim, bias=False
        )
    return p


def vision_apply(params, pixels: jax.Array, cfg: CLIPVisionConfig):
    """pixels: (B, H, W, 3) normalized. Returns `hidden_states`,
    `last_hidden_state`, `pooled` (CLS after post-LN), `image_embeds`."""
    b = pixels.shape[0]
    x = jax.lax.conv_general_dilated(
        pixels,
        params["patch_embedding"]["w"].astype(pixels.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype), (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + L.embedding(params["position_embedding"], jnp.arange(x.shape[1]))[None]
    x = L.layer_norm(params["pre_ln"], x)
    act = _act(cfg.hidden_act)
    hidden = [x]
    for i in range(cfg.num_layers):
        x = _layer(params[f"layer_{i}"], x, cfg.num_heads, act, causal=False)
        hidden.append(x)
    pooled = L.layer_norm(params["post_ln"], x[:, 0])
    out = {
        "hidden_states": tuple(hidden),
        "last_hidden_state": x,
        "pooled": pooled,
    }
    if "visual_projection" in params:
        out["image_embeds"] = L.linear(params["visual_projection"], pooled)
    return out


# -------------------------------------------------------------- converters

_TEXT_RULES = [
    (r"text_model\.embeddings\.token_embedding\.weight", r"token_embedding.w", None),
    (
        r"text_model\.embeddings\.position_embedding\.weight",
        r"position_embedding.w",
        None,
    ),
    (r"text_model\.encoder\.layers\.(\d+)\.layer_norm1\.weight", r"layer_\1.ln1.g", None),
    (r"text_model\.encoder\.layers\.(\d+)\.layer_norm1\.bias", r"layer_\1.ln1.b", None),
    (r"text_model\.encoder\.layers\.(\d+)\.layer_norm2\.weight", r"layer_\1.ln2.g", None),
    (r"text_model\.encoder\.layers\.(\d+)\.layer_norm2\.bias", r"layer_\1.ln2.b", None),
    (r"text_model\.encoder\.layers\.(\d+)\.self_attn\.q_proj\.weight", r"layer_\1.q.w", "linear"),
    (r"text_model\.encoder\.layers\.(\d+)\.self_attn\.q_proj\.bias", r"layer_\1.q.b", None),
    (r"text_model\.encoder\.layers\.(\d+)\.self_attn\.k_proj\.weight", r"layer_\1.k.w", "linear"),
    (r"text_model\.encoder\.layers\.(\d+)\.self_attn\.k_proj\.bias", r"layer_\1.k.b", None),
    (r"text_model\.encoder\.layers\.(\d+)\.self_attn\.v_proj\.weight", r"layer_\1.v.w", "linear"),
    (r"text_model\.encoder\.layers\.(\d+)\.self_attn\.v_proj\.bias", r"layer_\1.v.b", None),
    (r"text_model\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.weight", r"layer_\1.o.w", "linear"),
    (r"text_model\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.bias", r"layer_\1.o.b", None),
    (r"text_model\.encoder\.layers\.(\d+)\.mlp\.fc1\.weight", r"layer_\1.fc1.w", "linear"),
    (r"text_model\.encoder\.layers\.(\d+)\.mlp\.fc1\.bias", r"layer_\1.fc1.b", None),
    (r"text_model\.encoder\.layers\.(\d+)\.mlp\.fc2\.weight", r"layer_\1.fc2.w", "linear"),
    (r"text_model\.encoder\.layers\.(\d+)\.mlp\.fc2\.bias", r"layer_\1.fc2.b", None),
    (r"text_model\.final_layer_norm\.weight", r"final_ln.g", None),
    (r"text_model\.final_layer_norm\.bias", r"final_ln.b", None),
    (r"text_projection\.weight", r"text_projection.w", "linear"),
    (r"text_model\.embeddings\.position_ids", r"__drop__", None),
]


def convert_text_from_hf(sd: dict) -> dict:
    from ..core import checkpoint as ckpt

    rules = [
        (pat, tgt, ckpt.linear_w if tr == "linear" else None)
        for pat, tgt, tr in _TEXT_RULES
    ]
    tree = ckpt.convert_state_dict(sd, rules, strict=True)
    tree.pop("__drop__", None)
    return tree


_VISION_RULES = [
    (r"vision_model\.embeddings\.patch_embedding\.weight", r"patch_embedding.w", "conv"),
    (r"vision_model\.embeddings\.class_embedding", r"class_embedding", None),
    (r"vision_model\.embeddings\.position_embedding\.weight", r"position_embedding.w", None),
    (r"vision_model\.pre_layrnorm\.weight", r"pre_ln.g", None),
    (r"vision_model\.pre_layrnorm\.bias", r"pre_ln.b", None),
    (r"vision_model\.post_layernorm\.weight", r"post_ln.g", None),
    (r"vision_model\.post_layernorm\.bias", r"post_ln.b", None),
    (r"vision_model\.encoder\.layers\.(\d+)\.layer_norm1\.weight", r"layer_\1.ln1.g", None),
    (r"vision_model\.encoder\.layers\.(\d+)\.layer_norm1\.bias", r"layer_\1.ln1.b", None),
    (r"vision_model\.encoder\.layers\.(\d+)\.layer_norm2\.weight", r"layer_\1.ln2.g", None),
    (r"vision_model\.encoder\.layers\.(\d+)\.layer_norm2\.bias", r"layer_\1.ln2.b", None),
    (r"vision_model\.encoder\.layers\.(\d+)\.self_attn\.q_proj\.weight", r"layer_\1.q.w", "linear"),
    (r"vision_model\.encoder\.layers\.(\d+)\.self_attn\.q_proj\.bias", r"layer_\1.q.b", None),
    (r"vision_model\.encoder\.layers\.(\d+)\.self_attn\.k_proj\.weight", r"layer_\1.k.w", "linear"),
    (r"vision_model\.encoder\.layers\.(\d+)\.self_attn\.k_proj\.bias", r"layer_\1.k.b", None),
    (r"vision_model\.encoder\.layers\.(\d+)\.self_attn\.v_proj\.weight", r"layer_\1.v.w", "linear"),
    (r"vision_model\.encoder\.layers\.(\d+)\.self_attn\.v_proj\.bias", r"layer_\1.v.b", None),
    (r"vision_model\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.weight", r"layer_\1.o.w", "linear"),
    (r"vision_model\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.bias", r"layer_\1.o.b", None),
    (r"vision_model\.encoder\.layers\.(\d+)\.mlp\.fc1\.weight", r"layer_\1.fc1.w", "linear"),
    (r"vision_model\.encoder\.layers\.(\d+)\.mlp\.fc1\.bias", r"layer_\1.fc1.b", None),
    (r"vision_model\.encoder\.layers\.(\d+)\.mlp\.fc2\.weight", r"layer_\1.fc2.w", "linear"),
    (r"vision_model\.encoder\.layers\.(\d+)\.mlp\.fc2\.bias", r"layer_\1.fc2.b", None),
    (r"visual_projection\.weight", r"visual_projection.w", "linear"),
    (r"vision_model\.embeddings\.position_ids", r"__drop__", None),
]


def convert_vision_from_hf(sd: dict) -> dict:
    from ..core import checkpoint as ckpt

    rules = []
    for pat, tgt, tr in _VISION_RULES:
        fn = {"linear": ckpt.linear_w, "conv": ckpt.conv_w, None: None}[tr]
        rules.append((pat, tgt, fn))
    tree = ckpt.convert_state_dict(sd, rules, strict=True)
    tree.pop("__drop__", None)
    return tree
