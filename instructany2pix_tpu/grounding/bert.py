"""BERT encoder — GroundingDINO's text tower (bert-base-uncased).

Post-LN transformer with learned position + token-type embeddings.
HF-parity tested via `convert_from_hf` on random tiny configs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from ..models import layers as L
from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 512
    type_vocab: int = 2
    ln_eps: float = 1e-12

    @staticmethod
    def base() -> "BertConfig":
        return BertConfig()

    @staticmethod
    def tiny() -> "BertConfig":
        return BertConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, max_positions=32,
        )


def init(key, cfg: BertConfig = BertConfig.tiny()):
    kc = KeyChain(key)
    d = cfg.hidden_size
    p = {
        "word_embeddings": L.embedding_init(kc(), cfg.vocab_size, d),
        "position_embeddings": L.embedding_init(kc(), cfg.max_positions, d),
        "token_type_embeddings": L.embedding_init(kc(), cfg.type_vocab, d),
        "embed_ln": L.layer_norm_init(d),
    }
    for i in range(cfg.num_layers):
        p[f"layer_{i}"] = {
            "q": L.linear_init(kc(), d, d),
            "k": L.linear_init(kc(), d, d),
            "v": L.linear_init(kc(), d, d),
            "o": L.linear_init(kc(), d, d),
            "attn_ln": L.layer_norm_init(d),
            "fc1": L.linear_init(kc(), d, cfg.intermediate_size),
            "fc2": L.linear_init(kc(), cfg.intermediate_size, d),
            "out_ln": L.layer_norm_init(d),
        }
    return p


def forward(
    params,
    cfg: BertConfig,
    input_ids: jax.Array,  # (B, S)
    attention_mask: Optional[jax.Array] = None,  # (B, S) 1=keep
    self_attn_mask: Optional[jax.Array] = None,  # (B, S, S) phrase-local mask
):
    b, s = input_ids.shape
    x = L.embedding(params["word_embeddings"], input_ids)
    x = x + L.embedding(params["position_embeddings"], jnp.arange(s))[None]
    x = x + params["token_type_embeddings"]["w"][0][None, None]
    x = L.layer_norm(params["embed_ln"], x, cfg.ln_eps)

    mask = None
    if self_attn_mask is not None:
        mask = self_attn_mask.astype(bool)
        if attention_mask is not None:
            mask = mask & attention_mask.astype(bool)[:, None, :]
    elif attention_mask is not None:
        mask = attention_mask.astype(bool)

    hd = cfg.hidden_size // cfg.num_heads
    for i in range(cfg.num_layers):
        p = params[f"layer_{i}"]
        q = L.linear(p["q"], x).reshape(b, s, cfg.num_heads, hd)
        k = L.linear(p["k"], x).reshape(b, s, cfg.num_heads, hd)
        v = L.linear(p["v"], x).reshape(b, s, cfg.num_heads, hd)
        o = dot_product_attention(q, k, v, mask=mask, impl="xla").reshape(b, s, -1)
        x = L.layer_norm(p["attn_ln"], x + L.linear(p["o"], o), cfg.ln_eps)
        h = L.linear(p["fc2"], L.gelu(L.linear(p["fc1"], x)))
        x = L.layer_norm(p["out_ln"], x + h, cfg.ln_eps)
    return x


_RULES = [
    (r"(?:bert\.)?embeddings\.word_embeddings\.weight", r"word_embeddings.w", None),
    (r"(?:bert\.)?embeddings\.position_embeddings\.weight", r"position_embeddings.w", None),
    (r"(?:bert\.)?embeddings\.token_type_embeddings\.weight", r"token_type_embeddings.w", None),
    (r"(?:bert\.)?embeddings\.LayerNorm\.weight", r"embed_ln.g", None),
    (r"(?:bert\.)?embeddings\.LayerNorm\.bias", r"embed_ln.b", None),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.attention\.self\.query\.weight", r"layer_\1.q.w", "linear"),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.attention\.self\.query\.bias", r"layer_\1.q.b", None),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.attention\.self\.key\.weight", r"layer_\1.k.w", "linear"),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.attention\.self\.key\.bias", r"layer_\1.k.b", None),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.attention\.self\.value\.weight", r"layer_\1.v.w", "linear"),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.attention\.self\.value\.bias", r"layer_\1.v.b", None),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.attention\.output\.dense\.weight", r"layer_\1.o.w", "linear"),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.attention\.output\.dense\.bias", r"layer_\1.o.b", None),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.attention\.output\.LayerNorm\.weight", r"layer_\1.attn_ln.g", None),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.attention\.output\.LayerNorm\.bias", r"layer_\1.attn_ln.b", None),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.intermediate\.dense\.weight", r"layer_\1.fc1.w", "linear"),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.intermediate\.dense\.bias", r"layer_\1.fc1.b", None),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.output\.dense\.weight", r"layer_\1.fc2.w", "linear"),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.output\.dense\.bias", r"layer_\1.fc2.b", None),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.output\.LayerNorm\.weight", r"layer_\1.out_ln.g", None),
    (r"(?:bert\.)?encoder\.layer\.(\d+)\.output\.LayerNorm\.bias", r"layer_\1.out_ln.b", None),
    (r"(?:bert\.)?pooler\..*", r"__drop__", None),
    (r".*position_ids", r"__drop__", None),
]


def convert_from_hf(sd: dict) -> dict:
    from ..core import checkpoint as ckpt

    rules = [
        (pat, tgt, ckpt.linear_w if tr == "linear" else None) for pat, tgt, tr in _RULES
    ]
    tree = ckpt.convert_state_dict(sd, rules, strict=False)
    tree.pop("__drop__", None)
    return tree
