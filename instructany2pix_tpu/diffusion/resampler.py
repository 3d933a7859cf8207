"""Perceiver Resampler — IP-Adapter Plus image-token projector.

Rebuild of reference diffusion/ip_adapter/resampler.py:34-147: learned
latents cross-attend the full CLIP patch sequence (kv = [features,
latents]), split-scale attention (q·s)(k·s)ᵀ with s = dim_head^-1/4,
GEGLU-free LayerNorm-MLP feedforward, optional positional embedding and
mean-pooled extra latents. Backs the IPAdapterPlus(XL) variants
(reference ip_adapter.py:359-491).
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from ..models import layers as L


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    dim: int = 1024
    depth: int = 8
    dim_head: int = 64
    heads: int = 16
    num_queries: int = 8
    embedding_dim: int = 768
    output_dim: int = 1024
    ff_mult: int = 4
    max_seq_len: int = 257
    apply_pos_emb: bool = False
    num_latents_mean_pooled: int = 0

    @staticmethod
    def plus_xl() -> "ResamplerConfig":
        # IPAdapterPlusXL: depth 4, heads 20, 16 queries, ctx 2048 out
        return ResamplerConfig(
            dim=1280, depth=4, heads=20, num_queries=16,
            embedding_dim=1280, output_dim=2048,
        )

    @staticmethod
    def tiny() -> "ResamplerConfig":
        return ResamplerConfig(
            dim=32, depth=2, dim_head=8, heads=4, num_queries=4,
            embedding_dim=16, output_dim=24, ff_mult=2, max_seq_len=10,
        )


def init(key, cfg: ResamplerConfig = ResamplerConfig()):
    kc = KeyChain(key)
    inner = cfg.dim_head * cfg.heads
    p = {
        "latents": jax.random.normal(kc(), (1, cfg.num_queries, cfg.dim))
        / cfg.dim**0.5,
        "proj_in": L.linear_init(kc(), cfg.embedding_dim, cfg.dim),
        "proj_out": L.linear_init(kc(), cfg.dim, cfg.output_dim),
        "norm_out": L.layer_norm_init(cfg.output_dim),
    }
    if cfg.apply_pos_emb:
        p["pos_emb"] = L.embedding_init(kc(), cfg.max_seq_len, cfg.embedding_dim)
    if cfg.num_latents_mean_pooled > 0:
        p["mean_pooled"] = {
            "ln": L.layer_norm_init(cfg.dim),
            "proj": L.linear_init(
                kc(), cfg.dim, cfg.dim * cfg.num_latents_mean_pooled
            ),
        }
    for i in range(cfg.depth):
        p[f"layer_{i}"] = {
            "norm1": L.layer_norm_init(cfg.dim),
            "norm2": L.layer_norm_init(cfg.dim),
            "to_q": L.linear_init(kc(), cfg.dim, inner, bias=False),
            "to_kv": L.linear_init(kc(), cfg.dim, inner * 2, bias=False),
            "to_out": L.linear_init(kc(), inner, cfg.dim, bias=False),
            # FeedForward: LayerNorm → Linear(d, d·mult) → GELU → Linear
            "ff_ln": L.layer_norm_init(cfg.dim),
            "ff1": L.linear_init(kc(), cfg.dim, cfg.dim * cfg.ff_mult, bias=False),
            "ff2": L.linear_init(kc(), cfg.dim * cfg.ff_mult, cfg.dim, bias=False),
        }
    return p


def _perceiver_attention(p, x, latents, heads, dim_head):
    xn = L.layer_norm(p["norm1"], x)
    ln = L.layer_norm(p["norm2"], latents)
    b, nl, _ = ln.shape
    q = L.linear(p["to_q"], ln)
    kv_in = jnp.concatenate([xn, ln], axis=1)
    k, v = jnp.split(L.linear(p["to_kv"], kv_in), 2, axis=-1)

    def heads_first(t):
        return t.reshape(b, t.shape[1], heads, dim_head).transpose(0, 2, 1, 3)

    q, k, v = heads_first(q), heads_first(k), heads_first(v)
    scale = 1.0 / (dim_head**0.25)
    w = jnp.einsum("bhqd,bhkd->bhqk", (q * scale), (k * scale).astype(q.dtype))
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, nl, heads * dim_head)
    return L.linear(p["to_out"], out)


def apply(params, x: jax.Array, cfg: ResamplerConfig = ResamplerConfig()):
    """x: (B, N, embedding_dim) CLIP penultimate hidden states →
    (B, num_queries [+ mean-pooled], output_dim) ip tokens."""
    b, n, _ = x.shape
    if "pos_emb" in params:
        x = x + L.embedding(params["pos_emb"], jnp.arange(n))[None]
    latents = jnp.tile(params["latents"], (b, 1, 1))
    x = L.linear(params["proj_in"], x)
    if "mean_pooled" in params:
        pooled = jnp.mean(x, axis=1)
        extra = L.linear(
            params["mean_pooled"]["proj"],
            L.layer_norm(params["mean_pooled"]["ln"], pooled),
        ).reshape(b, cfg.num_latents_mean_pooled, cfg.dim)
        latents = jnp.concatenate([extra, latents], axis=1)
    for i in range(cfg.depth):
        p = params[f"layer_{i}"]
        latents = _perceiver_attention(p, x, latents, cfg.heads, cfg.dim_head) + latents
        h = L.layer_norm(p["ff_ln"], latents)
        latents = L.linear(p["ff2"], L.gelu(L.linear(p["ff1"], h))) + latents
    out = L.linear(params["proj_out"], latents)
    return L.layer_norm(params["norm_out"], out)


def get_image_embeds_plus(params, cfg, clip_hidden, clip_hidden_uncond):
    """IPAdapterPlus.get_image_embeds: cond/uncond token pairs from the
    CLIP penultimate hidden states (reference ip_adapter.py:398-410)."""
    return apply(params, clip_hidden, cfg), apply(params, clip_hidden_uncond, cfg)
