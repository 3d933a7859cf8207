"""Llama-class decoder (Vicuna-7B backbone) — pure-functional, KV-cached.

Rebuild of the reference's `InstructAny2PixLMForCausalLM` base
(HF LlamaForCausalLM, reference llm/model/language_model/
any2pix_llama.py:177) as an idiomatic JAX decoder:

  * RMSNorm, rotary embeddings, (GQA-capable) attention, SwiGLU MLP.
  * Full-sequence forward uses the Pallas flash-attention kernel
    (causal). Decode steps use a preallocated KV cache — the reference
    generates with `use_cache=False`, recomputing the whole prefix per
    token (reference pipeline.py:208); here decode is O(T) per token.
  * `inputs_embeds` entry point so multimodal embedding splicing
    (`extra_replacement`, any2pix_llama.py:255-296) happens before the
    stack, exactly like the reference's embed-then-overwrite.
  * HF state-dict converter incl. resized embeddings for the 9 added
    special tokens (reference llm/model/make_delta.py:19-28).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from ..ops.attention import dot_product_attention
from . import layers as L


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32009  # 32000 + 9 special gen tokens
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    # 1e-6 = the HF LlamaConfig default that Vicuna-7B (Llama-1) ships in
    # its config.json — the reference's LLM class (pipeline.py:22-37).
    # The repo carried 1e-5 (the Llama-2 convention) until the composed
    # torch golden (tests/test_composed_pipeline_golden.py) caught the
    # divergence: with small hidden variance the eps mismatch contributes
    # Δeps/(2·var) ≈ 0.5% per norm to every hidden state.
    rms_eps: float = 1e-6
    tie_embeddings: bool = False
    remat: bool = False  # jax.checkpoint each block (reference grad
    # checkpointing, train.py:789-795 / scripts/train.sh:46)
    # remat policy: "full" recomputes everything (min memory);
    # "dots" saves matmul outputs and recomputes only elementwise
    # (≈fwd-FLOP savings in backward at ~2 bytes/act-element memory)
    remat_policy: str = "full"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def vicuna_7b(vocab_size: int = 32009) -> "LlamaConfig":
        return LlamaConfig(vocab_size=vocab_size)

    @staticmethod
    def tiny(vocab_size: int = 128) -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=4,
            max_seq_len=128,
        )


class KVCache(NamedTuple):
    k: jax.Array  # (layers, B, max_len, kv_heads, head_dim)
    v: jax.Array
    length: jax.Array  # () int32 — tokens currently cached

    @staticmethod
    def create(cfg: LlamaConfig, batch: int, max_len: Optional[int] = None, dtype=jnp.bfloat16):
        max_len = max_len or cfg.max_seq_len
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return KVCache(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32)
        )


def _rope_tables(positions, half, theta):
    """cos/sin tables for `_rope_apply`, (B, S, 1, half) — computed once
    per forward and shared by every layer's q and k (was recomputed 64×
    per decode step)."""
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions.astype(jnp.float32)[..., None] * freqs  # (B,S,half)
    return jnp.cos(angles)[:, :, None, :], jnp.sin(angles)[:, :, None, :]


def _rope_apply(x, cos, sin):
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    )
    return out.astype(x.dtype)


def _rope(x, positions, theta):
    """Rotary embedding, HF convention (half-split rotate)."""
    cos, sin = _rope_tables(positions, x.shape[-1] // 2, theta)
    return _rope_apply(x, cos, sin)


def init(key, cfg: LlamaConfig = LlamaConfig.tiny()):
    kc = KeyChain(key)
    d, hd = cfg.hidden_size, cfg.head_dim
    p = {"embed_tokens": L.embedding_init(kc(), cfg.vocab_size, d)}
    for i in range(cfg.num_layers):
        p[f"layer_{i}"] = {
            "input_norm": L.rms_norm_init(d),
            "q": L.linear_init(kc(), d, cfg.num_heads * hd, bias=False),
            "k": L.linear_init(kc(), d, cfg.num_kv_heads * hd, bias=False),
            "v": L.linear_init(kc(), d, cfg.num_kv_heads * hd, bias=False),
            "o": L.linear_init(kc(), cfg.num_heads * hd, d, bias=False),
            "post_norm": L.rms_norm_init(d),
            "gate": L.linear_init(kc(), d, cfg.intermediate_size, bias=False),
            "up": L.linear_init(kc(), d, cfg.intermediate_size, bias=False),
            "down": L.linear_init(kc(), cfg.intermediate_size, d, bias=False),
        }
    p["final_norm"] = L.rms_norm_init(d)
    if not cfg.tie_embeddings:
        p["lm_head"] = L.linear_init(kc(), d, cfg.vocab_size, bias=False)
    return p


def embed(params, input_ids):
    return L.embedding(params["embed_tokens"], input_ids)


def stack_layers(params, cfg: LlamaConfig):
    """Training-time transform: stack the per-layer subtrees into one
    `layers` pytree with a leading layer axis so `forward` runs them as
    a `lax.scan` — one compiled block instead of num_layers unrolled
    copies (smaller HLO, faster compiles, and per-layer overhead is
    paid once). Inverse: `unstack_layers`. Decode (KV cache) keeps the
    unrolled path — the cache is indexed per layer."""
    out = {k: v for k, v in params.items() if not k.startswith("layer_")}
    layers = [params[f"layer_{i}"] for i in range(cfg.num_layers)]
    out["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return out


def unstack_layers(params, cfg: LlamaConfig):
    out = {k: v for k, v in params.items() if k != "layers"}
    for i in range(cfg.num_layers):
        out[f"layer_{i}"] = jax.tree.map(lambda x: x[i], params["layers"])
    return out


def fuse_projections(params):
    """Inference-time transform: concat q|k|v → "qkv" and gate|up →
    "gate_up" per layer, so bandwidth-bound decode runs 4 matvec
    kernels per layer instead of 7 (fewer launches, longer DMA
    pipelines). Works on float ("w"), LoRA-free int8 ("w_q") and packed
    int4 ("w_q4") trees — all concat along the output axis, and
    per-output-channel scales concat with them. Semantics-preserving
    (tests/test_llm_models.py); apply after checkpoint load or after
    ops.quant.quantize_llama, before jit. For single-device or
    data-parallel decode only: the TP rules in parallel/sharding.py
    shard the UNFUSED names (a fused qkv shard would cross the q/k/v
    boundaries)."""

    def fusable(parts):
        # refuse silent semantics changes: LoRA factors can't concat
        # (they'd need block-diagonal lora_b), biases would be dropped,
        # and mixed quant formats (e.g. int4 q + int8 k) can't share one
        # kernel — leave such layers unfused rather than corrupt them
        fmt = [next((k for k in ("w", "w_q", "w_q4") if k in p), None) for p in parts]
        if None in fmt or len(set(fmt)) != 1:
            return False
        return not any("lora_a" in p or "b" in p for p in parts)

    def cat(parts):
        key = next(k for k in ("w", "w_q", "w_q4") if k in parts[0])
        out = {key: jnp.concatenate([p[key] for p in parts], axis=1)}
        if "scale" in parts[0]:
            out["scale"] = jnp.concatenate([p["scale"] for p in parts])
        if "gscale" in parts[0]:
            out["gscale"] = jnp.concatenate([p["gscale"] for p in parts], axis=1)
        return out

    out = {}
    for name, node in params.items():
        if name.startswith("layer_") and "q" in node and "gate" in node:
            node = dict(node)
            if fusable([node["q"], node["k"], node["v"]]):
                node["qkv"] = cat([node.pop("q"), node.pop("k"), node.pop("v")])
            if fusable([node["gate"], node["up"]]):
                node["gate_up"] = cat([node.pop("gate"), node.pop("up")])
        out[name] = node
    return out


def _block(p, x, positions, cfg, mask, cache_kv=None, cache_len=None,
           prefix_pad=None, rope_cs=None):
    """One decoder layer. Returns (x, (k_new, v_new)) where k_new/v_new
    are this call's keys/values (for cache update).

    Decode-glue fusion (BASELINE.md r4 decode-attribution row — 0.7 ms
    of a 6 ms step was XLA between the matvec kernels): both RMSNorms
    ride the following quantized matvec as a kernel prologue, the
    silu(gate)·up pairing and the MLP residual ride the down-proj, and
    rope cos/sin plus the decode mask arrive precomputed from `forward`
    (`rope_cs` / `mask`) instead of being rebuilt per layer. The same
    `L.linear` kwargs compose identical unfused ops on float/prefill/CPU
    paths, so this is one code path for all of them."""
    b, s, d = x.shape
    hd = cfg.head_dim
    in_norm = (p["input_norm"]["g"], cfg.rms_eps)
    if "qkv" in p:
        qkv = L.linear(p["qkv"], x, norm=in_norm)
        nq, nkv = cfg.num_heads * hd, cfg.num_kv_heads * hd
        q = qkv[..., :nq].reshape(b, s, cfg.num_heads, hd)
        k = qkv[..., nq:nq + nkv].reshape(b, s, cfg.num_kv_heads, hd)
        v = qkv[..., nq + nkv:].reshape(b, s, cfg.num_kv_heads, hd)
    else:
        h = L.rms_norm(p["input_norm"], x, cfg.rms_eps)
        q = L.linear(p["q"], h).reshape(b, s, cfg.num_heads, hd)
        k = L.linear(p["k"], h).reshape(b, s, cfg.num_kv_heads, hd)
        v = L.linear(p["v"], h).reshape(b, s, cfg.num_kv_heads, hd)
    if rope_cs is None:
        rope_cs = _rope_tables(positions, hd // 2, cfg.rope_theta)
    q = _rope_apply(q, *rope_cs)
    k = _rope_apply(k, *rope_cs)

    if cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice_in_dim(ck, k.astype(ck.dtype), cache_len, axis=1)
        cv = jax.lax.dynamic_update_slice_in_dim(cv, v.astype(cv.dtype), cache_len, axis=1)
        if mask is None:
            mask = _decode_mask(b, s, ck.shape[1], cache_len, prefix_pad)
        o = dot_product_attention(
            q, ck.astype(q.dtype), cv.astype(q.dtype), mask=mask, impl="xla"
        )
        new_kv = (ck, cv)
    else:
        o = dot_product_attention(q, k, v, mask=mask, causal=True)
        new_kv = (k, v)
    x = L.linear(p["o"], o.reshape(b, s, cfg.num_heads * hd), residual=x)
    post_norm = (p["post_norm"]["g"], cfg.rms_eps)
    if "gate_up" in p:
        gu = L.linear(p["gate_up"], x, norm=post_norm)
        x = L.linear(p["down"], gu, swiglu=True, residual=x)
    else:
        h = L.rms_norm(p["post_norm"], x, cfg.rms_eps)
        x = x + L.linear(p["down"], L.silu(L.linear(p["gate"], h)) * L.linear(p["up"], h))
    return x, new_kv


def _decode_mask(b, s, max_len, cache_len, prefix_pad=None):
    """Absolute-position causal mask against the padded KV buffer:
    query row i (absolute position cache_len+i) sees keys
    0..cache_len+i; padded tail slots beyond cache_len+s stay masked.
    End-aligned `causal=True` would mis-align against the padded
    buffer. Built once per forward (identical for every layer)."""
    row = cache_len + jnp.arange(s)[:, None]
    col = jnp.arange(max_len)[None, :]
    valid = jnp.broadcast_to((col <= row)[None], (b, s, max_len))
    if prefix_pad is not None:
        # left-padded prompt: pad slots [0, prefix_pad) never attend;
        # scalar (uniform) or (B,) per-row pad counts both broadcast
        pp = jnp.asarray(prefix_pad).reshape(-1, 1, 1)
        valid = valid & (col[None] >= pp)
    return valid


def forward(
    params,
    cfg: LlamaConfig,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    cache: Optional[KVCache] = None,
    prefix_pad=None,
    layers: Optional[int] = None,
):
    """Full or incremental forward.

    Without `cache`: processes the whole sequence (training / prefill
    without cache). With `cache`: appends this chunk at `cache.length`
    and returns the updated cache (prefill chunk or single decode step).

    `layers` truncates the decoder to its first N layers with the SAME
    final norm + lm_head on top — the early-exit draft model of exact
    self-speculative decoding (llm/speculative.py). With a cache, pass
    one sliced to N layers (`KVCache(cache.k[:N], cache.v[:N], len)`).

    Returns dict: logits (B,S,V), hidden (B,S,D) — final pre-norm
    hidden states like HF `output_hidden_states[-1]`... note: HF's last
    entry equals the post-final-norm states; we return `hidden_norm`
    for that and `hidden` for the raw residual stream.
    """
    assert (input_ids is None) != (inputs_embeds is None)
    x = inputs_embeds if inputs_embeds is not None else embed(params, input_ids)
    b, s, _ = x.shape
    if positions is None:
        start = cache.length if cache is not None else 0
        positions = jnp.arange(s)[None, :] + start
        if prefix_pad is not None:
            # left-padded prompt: content starts at prefix_pad; pad slots
            # clamp to position 0 (they are masked out of attention).
            # Scalar or per-row (B,) pads both broadcast.
            positions = jnp.maximum(
                positions - jnp.asarray(prefix_pad).reshape(-1, 1), 0
            )
        positions = jnp.broadcast_to(positions, (b, s))

    # per-layer-invariant decode state, built once (was per layer):
    rope_cs = _rope_tables(positions, cfg.head_dim // 2, cfg.rope_theta)
    decode_mask = (
        _decode_mask(b, s, cache.k.shape[2], cache.length, prefix_pad)
        if cache is not None else None
    )

    if cache is None and "layers" in params:
        # stacked scan-over-layers (stack_layers): one compiled block
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if cfg.remat_policy == "dots"
            else jax.checkpoint_policies.nothing_saveable
        )

        def body(x, lp):
            fn = lambda p, h: _block(
                p, h, positions, cfg, attention_mask, rope_cs=rope_cs
            )[0]
            if cfg.remat:
                fn = jax.checkpoint(fn, policy=policy)
            return fn(lp, x), None

        x, _ = jax.lax.scan(body, x, params["layers"])
        hidden = x
        hidden_norm = L.rms_norm(params["final_norm"], x, cfg.rms_eps)
        if cfg.tie_embeddings:
            logits = hidden_norm @ params["embed_tokens"]["w"].T
        else:
            logits = L.linear(params["lm_head"], hidden_norm)
        return {"logits": logits, "hidden": hidden, "hidden_norm": hidden_norm}

    new_k, new_v = [], []
    for i in range(cfg.num_layers if layers is None else layers):
        if cache is not None:
            x, (ck, cv) = _block(
                params[f"layer_{i}"],
                x,
                positions,
                cfg,
                decode_mask,
                cache_kv=(cache.k[i], cache.v[i]),
                cache_len=cache.length,
                prefix_pad=prefix_pad,
                rope_cs=rope_cs,
            )
            new_k.append(ck)
            new_v.append(cv)
        else:
            if cfg.remat:
                policy = (
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                    if cfg.remat_policy == "dots"
                    else jax.checkpoint_policies.nothing_saveable
                )
                x, _ = jax.checkpoint(
                    lambda p, x: _block(
                        p, x, positions, cfg, attention_mask, rope_cs=rope_cs
                    ),
                    policy=policy,
                )(params[f"layer_{i}"], x)
            else:
                x, _ = _block(
                    params[f"layer_{i}"], x, positions, cfg, attention_mask,
                    rope_cs=rope_cs,
                )
    hidden = x
    hidden_norm = L.rms_norm(params["final_norm"], x, cfg.rms_eps)
    if cfg.tie_embeddings:
        logits = hidden_norm @ params["embed_tokens"]["w"].T
    else:
        logits = L.linear(params["lm_head"], hidden_norm)
    out = {"logits": logits, "hidden": hidden, "hidden_norm": hidden_norm}
    if cache is not None:
        out["cache"] = KVCache(
            jnp.stack(new_k), jnp.stack(new_v), cache.length + s
        )
    return out


# -------------------------------------------------------------- converter

_LLAMA_RULES = [
    (r"model\.embed_tokens\.weight", r"embed_tokens.w", None),
    (r"model\.layers\.(\d+)\.input_layernorm\.weight", r"layer_\1.input_norm.g", None),
    (r"model\.layers\.(\d+)\.self_attn\.q_proj\.weight", r"layer_\1.q.w", "linear"),
    (r"model\.layers\.(\d+)\.self_attn\.k_proj\.weight", r"layer_\1.k.w", "linear"),
    (r"model\.layers\.(\d+)\.self_attn\.v_proj\.weight", r"layer_\1.v.w", "linear"),
    (r"model\.layers\.(\d+)\.self_attn\.o_proj\.weight", r"layer_\1.o.w", "linear"),
    (r"model\.layers\.(\d+)\.post_attention_layernorm\.weight", r"layer_\1.post_norm.g", None),
    (r"model\.layers\.(\d+)\.mlp\.gate_proj\.weight", r"layer_\1.gate.w", "linear"),
    (r"model\.layers\.(\d+)\.mlp\.up_proj\.weight", r"layer_\1.up.w", "linear"),
    (r"model\.layers\.(\d+)\.mlp\.down_proj\.weight", r"layer_\1.down.w", "linear"),
    (r"model\.norm\.weight", r"final_norm.g", None),
    (r"lm_head\.weight", r"lm_head.w", "linear"),
    (r"model\.rotary_emb\..*", r"__drop__", None),
]


def convert_from_hf(sd: dict) -> dict:
    from ..core import checkpoint as ckpt

    rules = [
        (pat, tgt, ckpt.linear_w if tr == "linear" else None)
        for pat, tgt, tr in _LLAMA_RULES
    ]
    tree = ckpt.convert_state_dict(sd, rules, strict=False)
    tree.pop("__drop__", None)
    return tree
