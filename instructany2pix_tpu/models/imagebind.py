"""ImageBind-class audio/vision encoders → shared 1024-d embedding space.

The reference loads ImageBind-huge and calls it on CPU for every
conditioning input (reference pipeline.py:118,159-164:
`load_and_transform_{audio,vision}_data` → `model_imb(inputs)`). This
module provides inference-parity encoder graphs in JAX:

  * vision: ViT-H/14-class trunk (pre-LN transformer, cls token) +
    modality head (LayerNorm → Linear to 1024, no bias).
  * audio: log-mel spectrogram (128 bins, 16 kHz, 2 s clips) patchified
    by a 16×16 conv ViT-B trunk + head; multi-clip embeddings average.

Shapes/configs mirror the public ImageBind release so its checkpoint
converts via `convert_from_imagebind`. Preprocessing
(`preprocess_vision`, `preprocess_audio`) replaces the torchvision/
torchaudio transforms with numpy/JAX equivalents.
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
class ViTConfig:
    width: int = 1280
    layers: int = 32
    heads: int = 16
    patch: int = 14
    image_size: int = 224
    in_channels: int = 3
    out_dim: int = 1024
    mlp_ratio: float = 4.0
    pre_ln: bool = True
    stride: Optional[int] = None  # != patch → overlapping patches (audio)
    normalize_out: bool = True  # L2-normalize joint-space embedding
    out_scale: float = 1.0  # audio postprocessor logit scale (20.0)

    @property
    def eff_stride(self) -> int:
        return self.stride or self.patch

    @staticmethod
    def imagebind_vision() -> "ViTConfig":
        return ViTConfig()

    @staticmethod
    def imagebind_audio() -> "ViTConfig":
        # audio trunk: ViT-B/16 over 128×204 mel "images", 1 channel,
        # stride-10 overlapping patches, ×20 learned logit scale
        return ViTConfig(
            width=768, layers=12, heads=12, patch=16, image_size=0,
            in_channels=1, stride=10, out_scale=20.0,
        )

    @staticmethod
    def tiny(in_channels: int = 3) -> "ViTConfig":
        return ViTConfig(
            width=32, layers=2, heads=4, patch=14, image_size=28,
            in_channels=in_channels, out_dim=16,
        )


def _block_init(kc, d, mlp):
    return {
        "ln1": L.layer_norm_init(d),
        "qkv": L.linear_init(kc(), d, 3 * d),
        "proj": L.linear_init(kc(), d, d),
        "ln2": L.layer_norm_init(d),
        "fc1": L.linear_init(kc(), d, mlp),
        "fc2": L.linear_init(kc(), mlp, d),
    }


def _block(p, x, heads):
    b, s, d = x.shape
    hd = d // heads
    h = L.layer_norm(p["ln1"], x)
    qkv = L.linear(p["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if "bias_k" in p:
        # torch MultiheadAttention add_bias_kv=True (the official audio/
        # text trunks): one learned extra key/value position
        k = jnp.concatenate([k, jnp.broadcast_to(p["bias_k"].astype(k.dtype), (b, 1, d))], axis=1)
        v = jnp.concatenate([v, jnp.broadcast_to(p["bias_v"].astype(v.dtype), (b, 1, d))], axis=1)
    o = dot_product_attention(
        q.reshape(b, s, heads, hd),
        k.reshape(b, -1, heads, hd),
        v.reshape(b, -1, heads, hd),
    )
    x = x + L.linear(p["proj"], o.reshape(b, s, d))
    h = L.layer_norm(p["ln2"], x)
    x = x + L.linear(p["fc2"], L.gelu(L.linear(p["fc1"], h)))
    return x


def init(key, cfg: ViTConfig, num_patches: Optional[int] = None):
    kc = KeyChain(key)
    d = cfg.width
    if num_patches is None:
        num_patches = (cfg.image_size // cfg.patch) ** 2
    mlp = int(d * cfg.mlp_ratio)
    p = {
        "patch_embed": {
            "w": jax.random.normal(kc(), (cfg.patch, cfg.patch, cfg.in_channels, d)) * 0.02
        },
        "cls_token": jnp.zeros((1, 1, d)),
        "pos_embed": jax.random.normal(kc(), (1, num_patches + 1, d)) * 0.02,
        "head_ln": L.layer_norm_init(d),
        "head_proj": L.linear_init(kc(), d, cfg.out_dim, bias=False),
    }
    if cfg.pre_ln:
        p["pre_ln"] = L.layer_norm_init(d)
    for i in range(cfg.layers):
        p[f"block_{i}"] = _block_init(kc, d, mlp)
    return p


def apply(params, x: jax.Array, cfg: ViTConfig) -> jax.Array:
    """x: (B, H, W, C) preprocessed → (B, out_dim) joint-space embedding."""
    b = x.shape[0]
    h = jax.lax.conv_general_dilated(
        x,
        params["patch_embed"]["w"].astype(x.dtype),
        window_strides=(cfg.eff_stride, cfg.eff_stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, -1, cfg.width)
    if "patch_norm" in params:  # audio stem LayerNorm
        h = L.layer_norm(params["patch_norm"], h)
    cls = jnp.broadcast_to(params["cls_token"].astype(h.dtype), (b, 1, cfg.width))
    h = jnp.concatenate([cls, h], axis=1)
    assert h.shape[1] == params["pos_embed"].shape[1], (
        f"token count {h.shape[1]} != pos_embed {params['pos_embed'].shape[1]} — "
        "input resolution does not match the encoder config"
    )
    h = h + params["pos_embed"].astype(h.dtype)
    if "pre_ln" in params:
        h = L.layer_norm(params["pre_ln"], h)
    for i in range(cfg.layers):
        h = _block(params[f"block_{i}"], h, cfg.heads)
    pooled = h[:, 0]
    pooled = L.layer_norm(params["head_ln"], pooled)
    out = L.linear(params["head_proj"], pooled)
    if cfg.normalize_out:
        out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-9)
    return out * cfg.out_scale


# -------------------------------------------------------------- frontends

_V_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_V_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_vision(img: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 (H,W,3) → normalized (1, size, size, 3)."""
    from ..codecs.image_io import resize_center_crop

    x = resize_center_crop(img, size).astype(np.float32) / 255.0
    x = (x - _V_MEAN) / _V_STD
    return x[None]


def preprocess_audio(
    wav: np.ndarray,
    sr: int = 16000,
    num_mel_bins: int = 128,
    target_frames: int = 204,
    clip_seconds: float = 2.0,
    num_clips: int = 3,
) -> np.ndarray:
    """waveform → (num_clips, 128, target_frames, 1) normalized log-mel
    clips (ImageBind samples 3 × 2 s clips and averages embeddings)."""
    from ..codecs.processors import log_mel_spectrogram

    clip_len = int(sr * clip_seconds)
    total = max(len(wav), clip_len)
    wav = np.pad(wav, (0, max(0, total - len(wav))))
    starts = np.linspace(0, max(total - clip_len, 0), num_clips).astype(int)
    clips = []
    for s in starts:
        seg = wav[s : s + clip_len]
        mel = log_mel_spectrogram(
            seg, sr, n_fft=400, hop=clip_len // target_frames, n_mels=num_mel_bins
        )
        mel = mel[:, :target_frames]
        if mel.shape[1] < target_frames:
            mel = np.pad(mel, ((0, 0), (0, target_frames - mel.shape[1])))
        mel = (mel - mel.mean()) / (mel.std() + 1e-6)
        clips.append(mel[..., None])
    return np.stack(clips).astype(np.float32)


def embed_vision(params, cfg: ViTConfig, img: np.ndarray) -> jax.Array:
    size = cfg.image_size or 224
    return apply(params, jnp.asarray(preprocess_vision(img, size)), cfg)


def embed_audio(params, cfg: ViTConfig, wav: np.ndarray, sr: int = 16000) -> jax.Array:
    clips = jnp.asarray(preprocess_audio(wav, sr))
    emb = apply(params, clips, cfg)
    return jnp.mean(emb, axis=0, keepdims=True)


# ------------------------------------------------------------- converter


def convert_from_imagebind(path_or_sd, modality: str = "vision"):
    """Import the official imagebind_huge.pth naming for one modality.

    Key structure (facebookresearch/ImageBind):
      modality_preprocessors.<m>.cls_token / pos_embedding_helper.pos_embed
      modality_preprocessors.vision.rgbt_stem.proj.1.weight  (Conv3d over
        2 duplicated frames → temporal kernel summed into a 2D conv)
      modality_preprocessors.audio.audio_stem.proj.1.weight (+ norm_layer)
      modality_trunks.<m>.pre_transformer_layer.0.{weight,bias}
      modality_trunks.<m>.blocks.{i}.attn.in_proj_{weight,bias} /
        attn.out_proj.* / norm_1.* / norm_2.* / mlp.fc1/fc2.*
      modality_heads.<m>.0 (LayerNorm) / .2 (Linear, no bias)
    """
    from ..core import checkpoint as ckpt

    sd = (
        ckpt.load_torch_state_dict(path_or_sd)
        if isinstance(path_or_sd, str)
        else path_or_sd
    )
    m = modality
    pre = f"modality_preprocessors.{m}"
    trunk = f"modality_trunks.{m}"
    head = f"modality_heads.{m}"
    out = {}

    if m == "vision":
        w3d = sd[f"{pre}.rgbt_stem.proj.1.weight"]  # (D, 3, T, 14, 14)
        w2d = w3d.sum(axis=2)  # identical duplicated frames → sum T
        out["patch_embed"] = {"w": np.ascontiguousarray(np.transpose(w2d, (2, 3, 1, 0)))}
    else:
        w = sd[f"{pre}.audio_stem.proj.1.weight"]  # (D, 1, 16, 16)
        out["patch_embed"] = {"w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
        if f"{pre}.audio_stem.norm_layer.weight" in sd:
            out["patch_norm"] = {
                "g": sd[f"{pre}.audio_stem.norm_layer.weight"],
                "b": sd[f"{pre}.audio_stem.norm_layer.bias"],
            }
    out["cls_token"] = sd[f"{pre}.cls_token"].reshape(1, 1, -1)
    out["pos_embed"] = sd[f"{pre}.pos_embedding_helper.pos_embed"]
    if f"{trunk}.pre_transformer_layer.0.weight" in sd:
        out["pre_ln"] = {
            "g": sd[f"{trunk}.pre_transformer_layer.0.weight"],
            "b": sd[f"{trunk}.pre_transformer_layer.0.bias"],
        }
    i = 0
    while f"{trunk}.blocks.{i}.norm_1.weight" in sd:
        b = f"{trunk}.blocks.{i}"
        out[f"block_{i}"] = {
            "ln1": {"g": sd[f"{b}.norm_1.weight"], "b": sd[f"{b}.norm_1.bias"]},
            "qkv": {
                "w": ckpt.linear_w(sd[f"{b}.attn.in_proj_weight"]),
                "b": sd[f"{b}.attn.in_proj_bias"],
            },
            "proj": {
                "w": ckpt.linear_w(sd[f"{b}.attn.out_proj.weight"]),
                "b": sd[f"{b}.attn.out_proj.bias"],
            },
            **(
                {"bias_k": sd[f"{b}.attn.bias_k"].reshape(1, -1),
                 "bias_v": sd[f"{b}.attn.bias_v"].reshape(1, -1)}
                if f"{b}.attn.bias_k" in sd else {}
            ),
            "ln2": {"g": sd[f"{b}.norm_2.weight"], "b": sd[f"{b}.norm_2.bias"]},
            "fc1": {
                "w": ckpt.linear_w(sd[f"{b}.mlp.fc1.weight"]),
                "b": sd[f"{b}.mlp.fc1.bias"],
            },
            "fc2": {
                "w": ckpt.linear_w(sd[f"{b}.mlp.fc2.weight"]),
                "b": sd[f"{b}.mlp.fc2.bias"],
            },
        }
        i += 1
    out["head_ln"] = {"g": sd[f"{head}.0.weight"], "b": sd[f"{head}.0.bias"]}
    out["head_proj"] = {"w": ckpt.linear_w(sd[f"{head}.2.weight"])}
    return out
