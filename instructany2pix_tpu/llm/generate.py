"""KV-cached sampling loop with per-step hidden-state capture.

Replaces the reference's HF `generate(..., use_cache=False,
output_hidden_states=True)` call (reference pipeline.py:201-211) which
recomputes the full sequence per token. Here: one prefill + `lax.scan`
decode, O(T) per token, capturing the post-final-norm hidden state of
each step — `hiddens[i]` is the state that *sampled* `tokens[i]`,
matching the reference readout `hidden_states[i][-1][:, -1:]`
(pipeline.py:236 and the assert at pipeline.py:214).

Stopping: the vicuna_v1 stop keyword is `</s>` (= EOS token id); the
scan is fixed-length with a done flag, and the host trims at the first
EOS — byte-equivalent to `KeywordsStoppingCriteria` (reference
llm/mm_utils.py:77-107) for single-token keywords.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models import llama


class GenerateResult(NamedTuple):
    tokens: jax.Array  # (B, T) sampled ids (garbage after EOS)
    hiddens: jax.Array  # (B, T, D) hidden that predicted tokens[:, i]
    done_at: jax.Array  # (B,) index of first EOS (T if none)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "temperature", "eos_id", "max_len", "bucket"
    ),
)
def generate(
    params,
    cfg: llama.LlamaConfig,
    inputs_embeds: jax.Array,  # (B, S, D) — already multimodal-spliced
    key: jax.Array,
    max_new_tokens: int = 100,
    temperature: float = 0.3,
    eos_id: int = 2,
    max_len: Optional[int] = None,
    bucket: Optional[int] = None,
) -> GenerateResult:
    b, s, _ = inputs_embeds.shape
    # prompt-length bucketing: left-pad to a multiple of `bucket` so the
    # number of distinct compiled graphs is bounded (serving latency);
    # pad slots are masked out of attention and position numbering
    prefix_pad = 0
    if bucket is not None:
        padded = -(-s // bucket) * bucket
        prefix_pad = padded - s
        if prefix_pad:
            inputs_embeds = jnp.pad(
                inputs_embeds, ((0, 0), (prefix_pad, 0), (0, 0))
            )
            s = padded
    max_len = max_len or (s + max_new_tokens)
    cache = llama.KVCache.create(cfg, b, max_len=max_len, dtype=inputs_embeds.dtype)

    out = llama.forward(
        params, cfg, inputs_embeds=inputs_embeds, cache=cache,
        prefix_pad=prefix_pad or None,
    )
    cache = out["cache"]
    h_last = out["hidden_norm"][:, -1]  # predicts the first sampled token
    logits_last = out["logits"][:, -1]

    def sample(logits, k):
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1)
        return jax.random.categorical(k, logits.astype(jnp.float32) / temperature)

    key, k0 = jax.random.split(key)
    tok0 = sample(logits_last, k0)

    def step(carry, _):
        cache, tok, done, key = carry
        key, k = jax.random.split(key)
        emb = llama.embed(params, tok[:, None])
        out = llama.forward(
            params, cfg, inputs_embeds=emb, cache=cache,
            prefix_pad=prefix_pad or None,
        )
        done = done | (tok == eos_id)
        nxt = jnp.where(done, eos_id, sample(out["logits"][:, -1], k))
        return (out["cache"], nxt, done, key), (nxt, out["hidden_norm"][:, -1])

    done0 = tok0 == eos_id
    carry = (cache, tok0, done0, key)
    (_, _, _, _), (toks, hids) = jax.lax.scan(step, carry, None, length=max_new_tokens - 1)

    tokens = jnp.concatenate([tok0[:, None], jnp.moveaxis(toks, 0, 1)], axis=1)
    hiddens = jnp.concatenate([h_last[:, None], jnp.moveaxis(hids, 0, 1)], axis=1)
    is_eos = tokens == eos_id
    done_at = jnp.where(
        jnp.any(is_eos, axis=1), jnp.argmax(is_eos, axis=1), max_new_tokens
    )
    return GenerateResult(tokens, hiddens, done_at)
