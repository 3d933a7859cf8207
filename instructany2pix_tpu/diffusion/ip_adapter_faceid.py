"""IP-Adapter FaceID family — identity-conditioned generation.

Rebuild of the reference's vendored FaceID adapters (reference
diffusion/ip_adapter/ip_adapter_faceid.py — MLPProjModel :64-83,
ProjPlusModel :86-117, FacePerceiverResampler :27-61, IPAdapterFaceID
:120-255, IPAdapterFaceIDPlus :258-380 — and
attention_processor_faceid.py LoRAAttnProcessor :9-92 /
LoRAIPAttnProcessor :95-209). A 512-d face-recognition embedding
(insightface in the reference) projects to `num_tokens` extra context
tokens; the Plus variant additionally resamples CLIP penultimate
hidden states of the face crop through a small Perceiver conditioned
on those tokens; and every UNet attention carries low-rank (LoRA)
adapters on to_q/to_k/to_v/to_out.

TPU-native shape: the reference swaps per-layer "attention processor"
modules at runtime; here the graph stays static — `attach_faceid_lora`
is a param transform that adds lora_a/lora_b factors to the existing
attention linears (models/layers.linear applies them inline), and the
face tokens ride the same `ip_tokens` input as the main IP-Adapter
(models/unet.py cross-attn `to_k_ip/to_v_ip`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from ..models import layers as L
from .resampler import _perceiver_attention


@dataclasses.dataclass(frozen=True)
class FaceProjConfig:
    cross_attention_dim: int = 2048  # SDXL; SD1.5 uses 768
    id_embeddings_dim: int = 512
    clip_embeddings_dim: int = 1280
    num_tokens: int = 4
    plus: bool = False  # ProjPlusModel (FaceID-Plus checkpoints)
    depth: int = 4  # FacePerceiverResampler layers
    dim_head: int = 64
    ff_mult: int = 4

    @property
    def heads(self) -> int:
        return self.cross_attention_dim // self.dim_head

    @staticmethod
    def tiny(plus: bool = False) -> "FaceProjConfig":
        return FaceProjConfig(
            cross_attention_dim=32, id_embeddings_dim=16,
            clip_embeddings_dim=24, num_tokens=2, plus=plus, depth=2,
            dim_head=8, ff_mult=2,
        )


def init(key, cfg: FaceProjConfig = FaceProjConfig()):
    kc = KeyChain(key)
    idd, ca = cfg.id_embeddings_dim, cfg.cross_attention_dim
    p = {
        # MLPProjModel.proj: Linear(id, 2id) → GELU → Linear(2id, ca·n)
        "fc1": L.linear_init(kc(), idd, idd * 2),
        "fc2": L.linear_init(kc(), idd * 2, ca * cfg.num_tokens),
        "norm": L.layer_norm_init(ca),
    }
    if cfg.plus:
        inner = cfg.heads * cfg.dim_head
        r = {
            "proj_in": L.linear_init(kc(), cfg.clip_embeddings_dim, ca),
            "proj_out": L.linear_init(kc(), ca, ca),
            "norm_out": L.layer_norm_init(ca),
        }
        for i in range(cfg.depth):
            r[f"layer_{i}"] = {
                "norm1": L.layer_norm_init(ca),
                "norm2": L.layer_norm_init(ca),
                "to_q": L.linear_init(kc(), ca, inner, bias=False),
                "to_kv": L.linear_init(kc(), ca, inner * 2, bias=False),
                "to_out": L.linear_init(kc(), inner, ca, bias=False),
                "ff_ln": L.layer_norm_init(ca),
                "ff1": L.linear_init(kc(), ca, ca * cfg.ff_mult, bias=False),
                "ff2": L.linear_init(kc(), ca * cfg.ff_mult, ca, bias=False),
            }
        p["resampler"] = r
    return p


def apply(
    params,
    id_embeds: jax.Array,  # (B, id_embeddings_dim)
    cfg: FaceProjConfig = FaceProjConfig(),
    clip_embeds: Optional[jax.Array] = None,  # (B, N, clip_embeddings_dim)
    shortcut: bool = False,
    scale: float = 1.0,
) -> jax.Array:
    """→ (B, num_tokens, cross_attention_dim) face ip-tokens. With
    `cfg.plus`, `clip_embeds` (CLIP penultimate hidden states of the
    face crop) refine the tokens through the FacePerceiverResampler;
    `shortcut`/`scale` reproduce ProjPlusModel.forward's
    `x + scale * out` residual (reference ip_adapter_faceid.py:111-117,
    the v2 checkpoints)."""
    ca = cfg.cross_attention_dim
    x = L.linear(params["fc2"], L.gelu(L.linear(params["fc1"], id_embeds)))
    x = x.reshape(-1, cfg.num_tokens, ca)
    x = L.layer_norm(params["norm"], x)
    if not cfg.plus:
        return x
    assert clip_embeds is not None, "FaceID-Plus needs clip_embeds"
    r = params["resampler"]
    h = L.linear(r["proj_in"], clip_embeds)
    latents = x
    for i in range(cfg.depth):
        lp = r[f"layer_{i}"]
        latents = _perceiver_attention(lp, h, latents, cfg.heads, cfg.dim_head) + latents
        hh = L.layer_norm(lp["ff_ln"], latents)
        latents = L.linear(lp["ff2"], L.gelu(L.linear(lp["ff1"], hh))) + latents
    out = L.layer_norm(r["norm_out"], L.linear(r["proj_out"], latents))
    if shortcut:
        out = x + scale * out
    return out


def get_image_embeds(
    params,
    cfg: FaceProjConfig,
    faceid_embeds: jax.Array,
    clip_embeds: Optional[jax.Array] = None,
    clip_embeds_uncond: Optional[jax.Array] = None,
    shortcut: bool = False,
    s_scale: float = 1.0,
):
    """→ (cond_tokens, uncond_tokens). The uncond side projects ZERO id
    embeddings (reference ip_adapter_faceid.py:187-189) — and, for Plus,
    the CLIP states of a zero image (reference :330-336), which the
    caller supplies as `clip_embeds_uncond`."""
    cond = apply(params, faceid_embeds, cfg, clip_embeds, shortcut, s_scale)
    uncond = apply(
        params, jnp.zeros_like(faceid_embeds), cfg,
        clip_embeds_uncond if clip_embeds_uncond is not None else (
            jnp.zeros_like(clip_embeds) if clip_embeds is not None else None
        ),
        shortcut, s_scale,
    )
    return cond, uncond


# ------------------------------------------------------- LoRA transform


def attach_faceid_lora(unet_params, key, rank: int = 128,
                       network_alpha: Optional[float] = None):
    """Add zero-initialized LoRA factors to every UNet attention linear
    (to_q/to_k/to_v/to_out of attn1 AND attn2) — the static-graph
    equivalent of the reference's LoRAAttnProcessor swap
    (ip_adapter_faceid.py:144-166, rank 128). Zero-init lora_b keeps the
    transform semantics-preserving until weights are loaded/trained."""
    alpha = network_alpha if network_alpha is not None else float(rank)
    kc = KeyChain(key)

    def walk(node):
        if isinstance(node, dict):
            if "to_q" in node and "to_out" in node:
                node = dict(node)
                for k in ("to_q", "to_k", "to_v", "to_out"):
                    node[k] = L.add_lora(node[k], kc(), rank=rank, alpha=alpha)
                return node
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(unet_params)


# ------------------------------------------------------------ converter


def convert_faceid_from_torch(state_dict: dict, cfg, all_paths):
    """FaceID checkpoint → framework trees. `state_dict` is the
    reference's {"image_proj": ..., "ip_adapter": ...} (loaded at
    ip_adapter_faceid.py:169-183); `all_paths` lists EVERY attention's
    param path in diffusers attn_processors order with attn1/attn2
    interleaved (unet_convert.all_attn_paths) — the ip_adapter half is
    keyed by that ModuleList index. Returns (proj_params, lora_tree)
    where lora_tree maps attn path → per-linear LoRA/ip leaves to merge
    into the UNet tree."""
    from ..core import checkpoint as ckpt

    sd = state_dict["image_proj"]
    proj = {
        "fc1": {"w": ckpt.linear_w(sd["proj.0.weight"]), "b": sd["proj.0.bias"]},
        "fc2": {"w": ckpt.linear_w(sd["proj.2.weight"]), "b": sd["proj.2.bias"]},
        "norm": {"g": sd["norm.weight"], "b": sd["norm.bias"]},
    }
    if cfg.plus:
        r = {
            "proj_in": {"w": ckpt.linear_w(sd["perceiver_resampler.proj_in.weight"]),
                        "b": sd["perceiver_resampler.proj_in.bias"]},
            "proj_out": {"w": ckpt.linear_w(sd["perceiver_resampler.proj_out.weight"]),
                         "b": sd["perceiver_resampler.proj_out.bias"]},
            "norm_out": {"g": sd["perceiver_resampler.norm_out.weight"],
                         "b": sd["perceiver_resampler.norm_out.bias"]},
        }
        for i in range(cfg.depth):
            a = f"perceiver_resampler.layers.{i}.0"  # PerceiverAttention
            f = f"perceiver_resampler.layers.{i}.1"  # FeedForward
            r[f"layer_{i}"] = {
                "norm1": {"g": sd[f"{a}.norm1.weight"], "b": sd[f"{a}.norm1.bias"]},
                "norm2": {"g": sd[f"{a}.norm2.weight"], "b": sd[f"{a}.norm2.bias"]},
                "to_q": {"w": ckpt.linear_w(sd[f"{a}.to_q.weight"])},
                "to_kv": {"w": ckpt.linear_w(sd[f"{a}.to_kv.weight"])},
                "to_out": {"w": ckpt.linear_w(sd[f"{a}.to_out.weight"])},
                # reference FeedForward = Sequential(LayerNorm, Linear,
                # GELU, Linear) (resampler.py:14-22)
                "ff_ln": {"g": sd[f"{f}.0.weight"], "b": sd[f"{f}.0.bias"]},
                "ff1": {"w": ckpt.linear_w(sd[f"{f}.1.weight"])},
                "ff2": {"w": ckpt.linear_w(sd[f"{f}.3.weight"])},
            }
        proj["resampler"] = r

    ip_sd = state_dict["ip_adapter"]
    lora_tree = {}
    for i, path in enumerate(all_paths):
        sub = {}
        for name in ("to_q", "to_k", "to_v", "to_out"):
            down = ip_sd[f"{i}.{name}_lora.down.weight"]
            up = ip_sd[f"{i}.{name}_lora.up.weight"]
            sub[name] = {
                "lora_a": ckpt.linear_w(down),
                "lora_b": ckpt.linear_w(up),
                # LoRALinearLayer applies network_alpha/rank internally;
                # absent network_alpha the scale is 1
                "lora_scale": jnp.asarray(1.0, jnp.float32),
            }
        if f"{i}.to_k_ip.weight" in ip_sd:  # attn2 (LoRAIPAttnProcessor)
            sub["to_k_ip"] = {"w": ckpt.linear_w(ip_sd[f"{i}.to_k_ip.weight"])}
            sub["to_v_ip"] = {"w": ckpt.linear_w(ip_sd[f"{i}.to_v_ip.weight"])}
        lora_tree[path] = sub
    return proj, lora_tree


def merge_faceid_weights(unet_params: dict, lora_tree: dict) -> dict:
    """Install converted LoRA factors (+ face to_k_ip/to_v_ip) into the
    UNet tree at each attention path."""
    from ..core import tree as tree_util

    flat = tree_util.flatten(unet_params)
    for path, sub in lora_tree.items():
        for name, leaves in sub.items():
            for leaf, val in leaves.items():
                flat[f"{path}.{name}.{leaf}"] = val
    return tree_util.unflatten(flat)
