"""AutoencoderKL — the SD/SDXL image VAE, NHWC, pure-functional.

Capability parity with the diffusers AutoencoderKL the reference uses
for latent encode/decode (reference pipeline.py:101; DDIM inversion
VAE-encodes at ddim/pnp_pipeline.py:195-204) and with the vendored LDM
AutoencoderKL (reference llm/model/vae/image_vqvae.py:305-443).

Structure (SDXL config): conv_in → N down blocks (2 ResNets each,
stride-2 downsample between) → mid (ResNet, single-head attention,
ResNet) → GroupNorm/SiLU → conv_out to 2*latent moments; decoder is
the mirror with nearest-neighbor 2x upsampling. GroupNorm+SiLU runs
through the fused op layer.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from . import layers as L


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025  # SDXL; SD1.5 uses 0.18215

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)


def _resnet_init(kc: KeyChain, cin, cout):
    p = {
        "norm1": L.group_norm_init(cin),
        "conv1": L.conv_init(kc(), cin, cout, 3),
        "norm2": L.group_norm_init(cout),
        "conv2": L.conv_init(kc(), cout, cout, 3),
    }
    if cin != cout:
        p["shortcut"] = L.conv_init(kc(), cin, cout, 1)
    return p


def _resnet(p, x, groups):
    # diffusers VAE blocks use GroupNorm eps=1e-6 throughout
    h = L.group_norm(p["norm1"], x, groups, eps=1e-6, silu=True)
    h = L.conv2d(p["conv1"], h)
    h = L.group_norm(p["norm2"], h, groups, eps=1e-6, silu=True)
    h = L.conv2d(p["conv2"], h)
    if "shortcut" in p:
        x = L.conv2d(p["shortcut"], x)
    return x + h


def _attn_init(kc: KeyChain, c):
    return {
        "norm": L.group_norm_init(c),
        "q": L.linear_init(kc(), c, c),
        "k": L.linear_init(kc(), c, c),
        "v": L.linear_init(kc(), c, c),
        "o": L.linear_init(kc(), c, c),
    }


def _attn(p, x, groups):
    b, h, w, c = x.shape
    y = L.group_norm(p["norm"], x, groups, eps=1e-6)
    y = y.reshape(b, h * w, c)
    q = L.linear(p["q"], y)[:, :, None, :]
    k = L.linear(p["k"], y)[:, :, None, :]
    v = L.linear(p["v"], y)[:, :, None, :]
    from ..ops.attention import dot_product_attention

    o = dot_product_attention(q, k, v)[:, :, 0, :]
    o = L.linear(p["o"], o).reshape(b, h, w, c)
    return x + o


def init(key, cfg: VAEConfig = VAEConfig()):
    kc = KeyChain(key)
    ch = cfg.block_out_channels
    enc = {"conv_in": L.conv_init(kc(), cfg.in_channels, ch[0], 3)}
    cin = ch[0]
    for i, cout in enumerate(ch):
        blk = {}
        c = cin
        for j in range(cfg.layers_per_block):
            blk[f"res_{j}"] = _resnet_init(kc, c, cout)
            c = cout
        if i < len(ch) - 1:
            blk["down"] = L.conv_init(kc(), cout, cout, 3)
        enc[f"down_{i}"] = blk
        cin = cout
    enc["mid"] = {
        "res_0": _resnet_init(kc, cin, cin),
        "attn": _attn_init(kc, cin),
        "res_1": _resnet_init(kc, cin, cin),
    }
    enc["norm_out"] = L.group_norm_init(cin)
    enc["conv_out"] = L.conv_init(kc(), cin, 2 * cfg.latent_channels, 3)
    enc["quant_conv"] = L.conv_init(kc(), 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)

    dec = {
        "post_quant_conv": L.conv_init(kc(), cfg.latent_channels, cfg.latent_channels, 1),
        "conv_in": L.conv_init(kc(), cfg.latent_channels, ch[-1], 3),
    }
    cin = ch[-1]
    dec["mid"] = {
        "res_0": _resnet_init(kc, cin, cin),
        "attn": _attn_init(kc, cin),
        "res_1": _resnet_init(kc, cin, cin),
    }
    for i, cout in enumerate(reversed(ch)):
        blk = {}
        c = cin
        for j in range(cfg.layers_per_block + 1):
            blk[f"res_{j}"] = _resnet_init(kc, c, cout)
            c = cout
        if i < len(ch) - 1:
            blk["up"] = L.conv_init(kc(), cout, cout, 3)
        dec[f"up_{i}"] = blk
        cin = cout
    dec["norm_out"] = L.group_norm_init(cin)
    dec["conv_out"] = L.conv_init(kc(), cin, cfg.in_channels, 3)
    return {"encoder": enc, "decoder": dec}


def encode_moments(params, x, cfg: VAEConfig = VAEConfig()):
    """Image (B,H,W,3) in [-1,1] → (mean, logvar) latent moments."""
    p = params["encoder"]
    g = cfg.norm_num_groups
    h = L.conv2d(p["conv_in"], x)
    for i in range(len(cfg.block_out_channels)):
        blk = p[f"down_{i}"]
        for j in range(cfg.layers_per_block):
            h = _resnet(blk[f"res_{j}"], h, g)
        if "down" in blk:
            # diffusers pads (0,1,0,1) then stride-2 valid conv
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = L.conv2d(blk["down"], h, stride=2, padding="VALID")
    h = _resnet(p["mid"]["res_0"], h, g)
    h = _attn(p["mid"]["attn"], h, g)
    h = _resnet(p["mid"]["res_1"], h, g)
    h = L.group_norm(p["norm_out"], h, g, eps=1e-6, silu=True)
    h = L.conv2d(p["conv_out"], h)
    h = L.conv2d(p["quant_conv"], h)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def encode(params, x, key=None, cfg: VAEConfig = VAEConfig(), sample=True):
    """→ scaled latents (B, H/8, W/8, C). Deterministic mode uses the mean
    (the reference samples; DDIM inversion uses .latent_dist.sample()).
    `key` may be (B,) keys for per-row-deterministic batched serving."""
    from ..core.prng import row_normal

    mean, logvar = encode_moments(params, x, cfg)
    if sample and key is not None:
        z = mean + jnp.exp(0.5 * logvar) * row_normal(key, mean.shape, mean.dtype)
    else:
        z = mean
    return z * cfg.scaling_factor


def decode(params, z, cfg: VAEConfig = VAEConfig()):
    """Scaled latents → image (B,H,W,3) in [-1,1]."""
    p = params["decoder"]
    g = cfg.norm_num_groups
    h = z / cfg.scaling_factor
    h = L.conv2d(p["post_quant_conv"], h)
    h = L.conv2d(p["conv_in"], h)
    h = _resnet(p["mid"]["res_0"], h, g)
    h = _attn(p["mid"]["attn"], h, g)
    h = _resnet(p["mid"]["res_1"], h, g)
    n = len(cfg.block_out_channels)
    for i in range(n):
        blk = p[f"up_{i}"]
        for j in range(cfg.layers_per_block + 1):
            h = _resnet(blk[f"res_{j}"], h, g)
        if "up" in blk:
            h = L.upsample2x_nearest(h)
            h = L.conv2d(blk["up"], h)
    h = L.group_norm(p["norm_out"], h, g, eps=1e-6, silu=True)
    return L.conv2d(p["conv_out"], h)
