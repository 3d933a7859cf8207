"""GPT-2 core — backbone of the diffusion prior.

The reference's `InstructAny2PixPrior` wraps HF `GPT2Model` (reference
prior/model.py:187) and always feeds `inputs_embeds` assembled from
projected multimodal sequences (never token ids). This is that core:
pre-LN blocks, learned positions, gelu_new MLP, causal attention with
an optional key-padding mask. HF state-dict converter included (note
HF GPT-2 stores Conv1D weights as (in, out) — no transpose).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from ..ops.attention import dot_product_attention
from . import layers as L


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    hidden_size: int = 1024  # gpt2-medium
    num_layers: int = 24
    num_heads: int = 16
    max_positions: int = 1024
    ln_eps: float = 1e-5

    @staticmethod
    def medium() -> "GPT2Config":
        return GPT2Config()

    @staticmethod
    def tiny() -> "GPT2Config":
        return GPT2Config(hidden_size=32, num_layers=2, num_heads=4, max_positions=64)


def _gelu_new(x):
    return jax.nn.gelu(x, approximate=True)


def init(key, cfg: GPT2Config = GPT2Config.tiny()):
    kc = KeyChain(key)
    d = cfg.hidden_size
    p = {"wpe": L.embedding_init(kc(), cfg.max_positions, d)}
    for i in range(cfg.num_layers):
        p[f"layer_{i}"] = {
            "ln1": L.layer_norm_init(d),
            "attn_qkv": L.linear_init(kc(), d, 3 * d),
            "attn_out": L.linear_init(kc(), d, d),
            "ln2": L.layer_norm_init(d),
            "fc1": L.linear_init(kc(), d, 4 * d),
            "fc2": L.linear_init(kc(), 4 * d, d),
        }
    p["ln_f"] = L.layer_norm_init(d)
    return p


def forward(
    params,
    cfg: GPT2Config,
    inputs_embeds: jax.Array,  # (B, S, D)
    attention_mask: Optional[jax.Array] = None,  # (B, S) bool/int
    position_offset: int = 0,
):
    b, s, d = inputs_embeds.shape
    pos = jnp.arange(s) + position_offset
    x = inputs_embeds + L.embedding(params["wpe"], pos)[None].astype(inputs_embeds.dtype)
    mask = attention_mask.astype(bool) if attention_mask is not None else None
    hd = d // cfg.num_heads
    for i in range(cfg.num_layers):
        p = params[f"layer_{i}"]
        h = L.layer_norm(p["ln1"], x, cfg.ln_eps)
        qkv = L.linear(p["attn_qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, s, cfg.num_heads, hd)
        v = v.reshape(b, s, cfg.num_heads, hd)
        o = dot_product_attention(q, k, v, mask=mask, causal=True, impl="xla")
        x = x + L.linear(p["attn_out"], o.reshape(b, s, d))
        h = L.layer_norm(p["ln2"], x, cfg.ln_eps)
        x = x + L.linear(p["fc2"], _gelu_new(L.linear(p["fc1"], h)))
    return L.layer_norm(params["ln_f"], x, cfg.ln_eps)


# -------------------------------------------------------------- converter

_GPT2_RULES = [
    (r"wpe\.weight", r"wpe.w", None),
    (r"wte\.weight", r"__drop__", None),  # prior feeds inputs_embeds only
    (r"h\.(\d+)\.ln_1\.weight", r"layer_\1.ln1.g", None),
    (r"h\.(\d+)\.ln_1\.bias", r"layer_\1.ln1.b", None),
    # HF GPT-2 Conv1D stores (in, out) already — no transpose
    (r"h\.(\d+)\.attn\.c_attn\.weight", r"layer_\1.attn_qkv.w", None),
    (r"h\.(\d+)\.attn\.c_attn\.bias", r"layer_\1.attn_qkv.b", None),
    (r"h\.(\d+)\.attn\.c_proj\.weight", r"layer_\1.attn_out.w", None),
    (r"h\.(\d+)\.attn\.c_proj\.bias", r"layer_\1.attn_out.b", None),
    (r"h\.(\d+)\.ln_2\.weight", r"layer_\1.ln2.g", None),
    (r"h\.(\d+)\.ln_2\.bias", r"layer_\1.ln2.b", None),
    (r"h\.(\d+)\.mlp\.c_fc\.weight", r"layer_\1.fc1.w", None),
    (r"h\.(\d+)\.mlp\.c_fc\.bias", r"layer_\1.fc1.b", None),
    (r"h\.(\d+)\.mlp\.c_proj\.weight", r"layer_\1.fc2.w", None),
    (r"h\.(\d+)\.mlp\.c_proj\.bias", r"layer_\1.fc2.b", None),
    (r"ln_f\.weight", r"ln_f.g", None),
    (r"ln_f\.bias", r"ln_f.b", None),
    (r".*attn\.bias", r"__drop__", None),
    (r".*attn\.masked_bias", r"__drop__", None),
]


def convert_from_hf(sd: dict) -> dict:
    from ..core import checkpoint as ckpt

    tree = ckpt.convert_state_dict(sd, [(p, t, None) for p, t, _ in _GPT2_RULES], strict=False)
    tree.pop("__drop__", None)
    return tree
