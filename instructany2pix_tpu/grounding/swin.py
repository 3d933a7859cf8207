"""Swin Transformer backbone (Swin-T) — GroundingDINO's image encoder.

The reference consumes GroundingDINO-SwinT via the external
`groundingdino` pip package (reference gdino/lib.py:3-6,55-66). This is
the JAX backbone: 4 stages of shifted-window attention with relative
position bias, patch merging between stages; returns the multi-scale
feature maps (stages 1-3) the detector's deformable attention samples.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.prng import KeyChain
from ..models import layers as L


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    patch: int = 4
    mlp_ratio: float = 4.0
    out_stages: Tuple[int, ...] = (1, 2, 3)

    @staticmethod
    def tiny() -> "SwinConfig":
        return SwinConfig(
            embed_dim=8, depths=(1, 1, 2), heads=(1, 2, 4), window=2,
            out_stages=(1, 2),
        )

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2**i)


def _rel_bias_init(window):
    n = (2 * window - 1) ** 2
    return jnp.zeros((n,))


def _rel_index(window):
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + window - 1
    return jnp.asarray(rel[..., 0] * (2 * window - 1) + rel[..., 1])


def _block_init(kc, dim, heads, window, mlp):
    return {
        "ln1": L.layer_norm_init(dim),
        "qkv": L.linear_init(kc(), dim, 3 * dim),
        "proj": L.linear_init(kc(), dim, dim),
        "rel_bias": jnp.zeros(((2 * window - 1) ** 2, heads)),
        "ln2": L.layer_norm_init(dim),
        "fc1": L.linear_init(kc(), dim, mlp),
        "fc2": L.linear_init(kc(), mlp, dim),
    }


def _window_attn(p, x, heads, window, shift, rel_idx):
    b, hh, ww, d = x.shape
    hd = d // heads
    # official Swin order for non-divisible resolutions: PAD first, then
    # cyclic-shift the padded canvas (the shift mask's slice structure
    # is built for that layout); reversed on the way out
    pad_h = (window - hh % window) % window
    pad_w = (window - ww % window) % window
    xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = hh + pad_h, ww + pad_w
    if shift:
        xp = jnp.roll(xp, (-shift, -shift), axis=(1, 2))
    xw = xp.reshape(b, hp // window, window, wp // window, window, d)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, d)

    qkv = L.linear(p["qkv"], xw)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    nb = xw.shape[0]
    n = window * window
    q = q.reshape(nb, n, heads, hd)
    k = k.reshape(nb, n, heads, hd)
    v = v.reshape(nb, n, heads, hd)
    attn = jnp.einsum(
        "bnhd,bmhd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (hd**-0.5)
    bias = p["rel_bias"][rel_idx]  # (n, n, heads)
    attn = attn + bias.transpose(2, 0, 1)[None].astype(jnp.float32)

    if shift:
        # mask cross-window attention for rolled windows
        img_mask = np.zeros((1, hp, wp, 1), np.int32)
        cnt = 0
        for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
                img_mask[:, hs, ws, :] = cnt
                cnt += 1
        mw = jnp.asarray(img_mask).reshape(1, hp // window, window, wp // window, window, 1)
        mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, n)
        diff = mw[:, :, None] != mw[:, None, :]
        attn = attn - 1e9 * jnp.tile(diff, (b, 1, 1))[:, None].astype(jnp.float32)

    attn = jax.nn.softmax(attn, axis=-1)
    o = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v).reshape(nb, n, d)
    o = L.linear(p["proj"], o)
    o = o.reshape(b, hp // window, wp // window, window, window, d)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, d)
    if shift:
        o = jnp.roll(o, (shift, shift), axis=(1, 2))
    return o[:, :hh, :ww]


def init(key, cfg: SwinConfig = SwinConfig()):
    kc = KeyChain(key)
    p = {
        "patch_embed": L.conv_init(kc(), 3, cfg.embed_dim, cfg.patch),
        "patch_ln": L.layer_norm_init(cfg.embed_dim),
    }
    for s, depth in enumerate(cfg.depths):
        dim = cfg.stage_dim(s)
        mlp = int(dim * cfg.mlp_ratio)
        for b in range(depth):
            p[f"stage{s}_block{b}"] = _block_init(kc, dim, cfg.heads[s], cfg.window, mlp)
        if s < len(cfg.depths) - 1:
            p[f"merge_{s}"] = {
                "ln": L.layer_norm_init(4 * dim),
                "proj": L.linear_init(kc(), 4 * dim, 2 * dim, bias=False),
            }
    for s in cfg.out_stages:
        p[f"out_ln_{s}"] = L.layer_norm_init(cfg.stage_dim(s))
    return p


def apply(params, x: jax.Array, cfg: SwinConfig = SwinConfig()) -> List[jax.Array]:
    """x: (B, H, W, 3) normalized → multi-scale features
    [(B, H/8, W/8, 2C), (B, H/16, W/16, 4C), (B, H/32, W/32, 8C)] for
    the default out_stages."""
    rel_idx = _rel_index(cfg.window)
    h = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["w"].astype(x.dtype), (cfg.patch, cfg.patch),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["b"].astype(x.dtype)
    h = L.layer_norm(params["patch_ln"], h)

    outs = {}
    for s, depth in enumerate(cfg.depths):
        for bi in range(depth):
            p = params[f"stage{s}_block{bi}"]
            shift = 0 if bi % 2 == 0 else cfg.window // 2
            hh = L.layer_norm(p["ln1"], h)
            h = h + _window_attn(p, hh, cfg.heads[s], cfg.window, shift, rel_idx)
            hh = L.layer_norm(p["ln2"], h)
            h = h + L.linear(p["fc2"], L.gelu(L.linear(p["fc1"], hh)))
        if s in cfg.out_stages:
            outs[s] = L.layer_norm(params[f"out_ln_{s}"], h)
        if s < len(cfg.depths) - 1:
            b, hh_, ww_, d = h.shape
            ph, pw = hh_ % 2, ww_ % 2
            h = jnp.pad(h, ((0, 0), (0, ph), (0, pw), (0, 0)))
            h = jnp.concatenate(
                [h[:, 0::2, 0::2], h[:, 1::2, 0::2], h[:, 0::2, 1::2], h[:, 1::2, 1::2]],
                axis=-1,
            )
            h = L.layer_norm(params[f"merge_{s}"]["ln"], h)
            h = L.linear(params[f"merge_{s}"]["proj"], h)
    return [outs[s] for s in cfg.out_stages]
