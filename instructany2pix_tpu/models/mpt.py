"""MPT decoder backbone (ALiBi attention, LPLayerNorm, tied embeddings).

The reference vendors a full MPT implementation
(reference llm/model/language_model/mpt/, 2,072 LoC: modeling_mpt.py,
attention.py, blocks.py, norm.py, configuration_mpt.py) as an alternate
LLM backbone — never imported on its live path, but part of the
capability surface (`mpt_attn_impl` survives at reference train.py:88,
and the `mpt` conversation template is registered). This is the
TPU-native counterpart: one pure-functional module covering the
behaviors the vendored code actually computes —

  * ALiBi positional bias (attention.py:283-299 `gen_slopes` /
    `build_alibi_bias`): per-key bias for the causal path, full |i−j|
    matrix for the bidirectional/prefix path;
  * fused Wqkv projection, optional qk_ln / clip_qkv / custom softmax
    scale (attention.py:151-230);
  * LPLayerNorm — layer norm computed in fp32 with params downcast to
    the activation dtype (norm.py:15-26): here norm in f32, output in
    the activation dtype;
  * pre-norm blocks with GELU(exact) MLP at expansion_ratio
    (blocks.py:10-40);
  * tied wte logits, optional logit_scale incl. 'inv_sqrt_d_model',
    embedding_fraction shrink (modeling_mpt.py:191-252);
  * learned positional embeddings when alibi is off
    (modeling_mpt.py:56-57).

The reference's triton flash-attention kernel and HF-prefix-LM
converter are CUDA/HF-internals plumbing with no behavioral surface
here; attention runs through XLA (these sequence lengths sit below the
flash-kernel crossover measured in ops/attention.py).

Golden parity: tests/test_mpt.py drives the reference's own MPTBlock +
build_attn_bias as the oracle.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from . import layers as L


@dataclasses.dataclass(frozen=True)
class MPTConfig:
    d_model: int = 4096
    n_heads: int = 32
    n_layers: int = 32
    expansion_ratio: int = 4
    vocab_size: int = 50432
    max_seq_len: int = 2048
    alibi: bool = True
    alibi_bias_max: float = 8.0
    no_bias: bool = True
    qk_ln: bool = False
    clip_qkv: Optional[float] = None
    softmax_scale: Optional[float] = None
    logit_scale: Optional[float | str] = None
    embedding_fraction: float = 1.0
    ln_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def mpt_7b() -> "MPTConfig":
        return MPTConfig()

    @staticmethod
    def tiny() -> "MPTConfig":
        return MPTConfig(
            d_model=32, n_heads=4, n_layers=2, expansion_ratio=2,
            vocab_size=100, max_seq_len=64,
        )


def gen_slopes(n_heads: int, alibi_bias_max: float = 8.0) -> jnp.ndarray:
    """attention.py:283-290 — power-of-two ladder; non-pow2 head counts
    interleave the odd/even halves."""
    n2 = 2 ** math.ceil(math.log2(n_heads))
    m = jnp.arange(1, n2 + 1, dtype=jnp.float32) * (alibi_bias_max / n2)
    slopes = 1.0 / jnp.power(2.0, m)
    if n2 != n_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return slopes


def build_alibi_bias(
    n_heads: int, seq_len: int, full: bool = False, alibi_bias_max: float = 8.0
) -> jnp.ndarray:
    """(1, H, s_q|1, s_k) bias (attention.py:292-299). Causal path uses
    the per-key form (row constant cancels in softmax); `full` builds
    the symmetric −|i−j| matrix for prefix-LM/bidirectional use."""
    k = jnp.arange(1 - seq_len, 1, dtype=jnp.float32)[None, None, None, :]
    if full:
        bias = -jnp.abs(k - k.reshape(1, 1, seq_len, 1))
    else:
        bias = k
    return bias * gen_slopes(n_heads, alibi_bias_max).reshape(1, n_heads, 1, 1)


def _ln_init(d, bias: bool):
    p = {"g": jnp.ones((d,), jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((d,), jnp.float32)
    return p


def init(key, cfg: MPTConfig = MPTConfig.tiny()):
    kc = KeyChain(key)
    d = cfg.d_model
    bias = not cfg.no_bias
    p = {"wte": L.embedding_init(kc(), cfg.vocab_size, d)}
    if not cfg.alibi:
        p["wpe"] = L.embedding_init(kc(), cfg.max_seq_len, d)
    for i in range(cfg.n_layers):
        blk = {
            "norm_1": _ln_init(d, bias),
            "wqkv": L.linear_init(kc(), d, 3 * d, bias=bias),
            "out_proj": L.linear_init(kc(), d, d, bias=bias),
            "norm_2": _ln_init(d, bias),
            "up_proj": L.linear_init(kc(), d, cfg.expansion_ratio * d, bias=bias),
            "down_proj": L.linear_init(kc(), cfg.expansion_ratio * d, d, bias=bias),
        }
        if cfg.qk_ln:
            blk["q_ln"] = _ln_init(d, bias)
            blk["k_ln"] = _ln_init(d, bias)
        p[f"block_{i}"] = blk
    p["norm_f"] = _ln_init(d, bias)
    return p


class MPTCache(NamedTuple):
    k: jnp.ndarray  # (L, B, H, S, Dh)
    v: jnp.ndarray
    length: jnp.ndarray


def init_cache(cfg: MPTConfig, batch: int, max_len: int, dtype=jnp.float32):
    shape = (cfg.n_layers, batch, cfg.n_heads, max_len, cfg.head_dim)
    return MPTCache(
        jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
        jnp.zeros((), jnp.int32),
    )


def _lp_layer_norm(p, x, eps):
    # LPLayerNorm: statistics in fp32, result back in the input dtype;
    # "b" absent under no_bias (the reference deletes bias params,
    # modeling_mpt.py:68-72)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["g"].astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _attn(blk, x, cfg: MPTConfig, bias, key_mask, cache_kv=None, cache_len=None):
    b, s, d = x.shape
    h, hd = cfg.n_heads, cfg.head_dim
    qkv = L.linear(blk["wqkv"], x)
    if cfg.clip_qkv:
        qkv = jnp.clip(qkv, -cfg.clip_qkv, cfg.clip_qkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if cfg.qk_ln:
        q = _lp_layer_norm(blk["q_ln"], q, cfg.ln_eps)
        k = _lp_layer_norm(blk["k_ln"], k, cfg.ln_eps)
    q = q.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    new_kv = (k, v)
    if cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, cache_len, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, cache_len, 0))
        k, v = ck, cv
        new_kv = (ck, cv)
    scale = cfg.softmax_scale or 1.0 / math.sqrt(hd)
    w = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    s_k = k.shape[2]
    if bias is not None:
        # reference slicing (attention.py:36-38): keep the LAST s_q/s_k
        # rows/cols of the precomputed max-length bias
        bq = max(0, bias.shape[2] - s)
        bk = max(0, bias.shape[3] - s_k)
        w = w + bias[:, :, bq:, bk:].astype(w.dtype)
    neg = jnp.finfo(jnp.float32).min
    if key_mask is not None:
        w = jnp.where(key_mask[:, None, None, :], w, neg)
    if cache_kv is None:
        if s > 1:
            cm = jnp.tril(jnp.ones((s, s_k), bool), k=s_k - s)
            w = jnp.where(cm[None, None], w, neg)
    else:
        # decode/prefill against a static cache: keys beyond
        # cache_len + row position are invalid
        qpos = cache_len + jnp.arange(s)
        kpos = jnp.arange(s_k)
        cm = kpos[None, :] <= qpos[:, None]
        w = jnp.where(cm[None, None], w, neg)
    a = jax.nn.softmax(w, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", a, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    return L.linear(blk["out_proj"], out), new_kv


def forward(
    params,
    cfg: MPTConfig,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    prefix_lm_full_bias: bool = False,
    cache: Optional[MPTCache] = None,
):
    """Returns {"logits", "hidden"} (+ "cache" when caching). Matches
    the reference MPTModel.forward composition (modeling_mpt.py:144+):
    wte (· embedding_fraction shrink) → blocks over attn bias → norm_f
    → tied-wte logits (· logit_scale)."""
    assert (input_ids is None) != (inputs_embeds is None)
    x = (
        inputs_embeds
        if inputs_embeds is not None
        else L.embedding(params["wte"], input_ids)
    )
    b, s, _ = x.shape
    if cfg.embedding_fraction != 1.0:
        x = x * cfg.embedding_fraction + jax.lax.stop_gradient(x) * (
            1 - cfg.embedding_fraction
        )
    start = cache.length if cache is not None else 0
    if not cfg.alibi:
        pos = jnp.arange(s)[None, :] + start
        x = x + L.embedding(params["wpe"], pos)
    s_total = cache.k.shape[3] if cache is not None else s
    bias = (
        build_alibi_bias(
            cfg.n_heads, s_total, full=prefix_lm_full_bias,
            alibi_bias_max=cfg.alibi_bias_max,
        )
        if cfg.alibi
        else None
    )
    key_mask = attention_mask.astype(bool) if attention_mask is not None else None

    new_k, new_v = [], []
    for i in range(cfg.n_layers):
        blk = params[f"block_{i}"]
        a = _lp_layer_norm(blk["norm_1"], x, cfg.ln_eps)
        if cache is not None:
            o, (ck, cv) = _attn(
                blk, a, cfg, bias, key_mask,
                cache_kv=(cache.k[i], cache.v[i]), cache_len=cache.length,
            )
            new_k.append(ck)
            new_v.append(cv)
        else:
            o, _ = _attn(blk, a, cfg, bias, key_mask)
        x = x + o
        m = _lp_layer_norm(blk["norm_2"], x, cfg.ln_eps)
        n = L.linear(blk["down_proj"], L.gelu(L.linear(blk["up_proj"], m)))
        x = x + n
    hidden = _lp_layer_norm(params["norm_f"], x, cfg.ln_eps)
    logits = hidden @ params["wte"]["w"].T
    scale = cfg.logit_scale
    if scale == "inv_sqrt_d_model":
        scale = 1.0 / math.sqrt(cfg.d_model)
    if scale:
        logits = logits * scale
    out = {"logits": logits, "hidden": hidden}
    if cache is not None:
        out["cache"] = MPTCache(
            jnp.stack(new_k), jnp.stack(new_v), cache.length + s
        )
    return out


# --------------------------------------------------------------- import

_MPT_RULES = [
    (r"transformer\.wte\.weight", "wte.w", None),
    (r"transformer\.wpe\.weight", "wpe.w", None),
    (r"transformer\.blocks\.(\d+)\.norm_1\.weight", r"block_\1.norm_1.g", None),
    (r"transformer\.blocks\.(\d+)\.norm_1\.bias", r"block_\1.norm_1.b", None),
    (r"transformer\.blocks\.(\d+)\.attn\.Wqkv\.weight", r"block_\1.wqkv.w", "linear"),
    (r"transformer\.blocks\.(\d+)\.attn\.Wqkv\.bias", r"block_\1.wqkv.b", None),
    (r"transformer\.blocks\.(\d+)\.attn\.q_ln\.weight", r"block_\1.q_ln.g", None),
    (r"transformer\.blocks\.(\d+)\.attn\.q_ln\.bias", r"block_\1.q_ln.b", None),
    (r"transformer\.blocks\.(\d+)\.attn\.k_ln\.weight", r"block_\1.k_ln.g", None),
    (r"transformer\.blocks\.(\d+)\.attn\.k_ln\.bias", r"block_\1.k_ln.b", None),
    (r"transformer\.blocks\.(\d+)\.attn\.out_proj\.weight", r"block_\1.out_proj.w", "linear"),
    (r"transformer\.blocks\.(\d+)\.attn\.out_proj\.bias", r"block_\1.out_proj.b", None),
    (r"transformer\.blocks\.(\d+)\.norm_2\.weight", r"block_\1.norm_2.g", None),
    (r"transformer\.blocks\.(\d+)\.norm_2\.bias", r"block_\1.norm_2.b", None),
    (r"transformer\.blocks\.(\d+)\.ffn\.up_proj\.weight", r"block_\1.up_proj.w", "linear"),
    (r"transformer\.blocks\.(\d+)\.ffn\.up_proj\.bias", r"block_\1.up_proj.b", None),
    (r"transformer\.blocks\.(\d+)\.ffn\.down_proj\.weight", r"block_\1.down_proj.w", "linear"),
    (r"transformer\.blocks\.(\d+)\.ffn\.down_proj\.bias", r"block_\1.down_proj.b", None),
    (r"transformer\.norm_f\.weight", "norm_f.g", None),
    (r"transformer\.norm_f\.bias", "norm_f.b", None),
]


def convert_from_mpt(path_or_sd, cfg: MPTConfig) -> dict:
    """Official mosaicml/mpt checkpoint naming (transformer.*)."""
    from ..core import checkpoint as ckpt

    sd = (
        ckpt.load_torch_state_dict(path_or_sd)
        if isinstance(path_or_sd, str)
        else path_or_sd
    )
    rules = [
        (pat, tgt, ckpt.linear_w if tr == "linear" else None)
        for pat, tgt, tr in _MPT_RULES
    ]
    tree = ckpt.convert_state_dict(sd, rules, strict=True)
    tree.pop("__drop__", None)
    return tree
