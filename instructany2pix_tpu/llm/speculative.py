"""Exact self-speculative decoding (early-exit draft + batched verify).

The int4 decode matvec kernels are bandwidth-bound and M-flat: verifying
k drafted tokens in one forward costs the same HBM stream as decoding
one (measured T(M=1..8) within ±8% at all four 7B shapes,
`benchmarks/decode_bench.py`, BASELINE.md r4). A draft built from the
model's OWN first `draft_layers` layers (early exit through the shared
final norm + lm_head) therefore wins whenever
  acceptance·k_draft > 1 + k_draft·draft_layers/num_layers,
a draft-quality question that needs real checkpoints — but the
*machinery* is framework surface and its exactness is checkpoint-free:
greedy speculative output is token-identical to plain greedy decode
(tests/test_speculative.py), because every emitted token is the full
model's own argmax; the draft only decides how many verify positions
get batched per round.

Reference counterpart: none — the reference decodes with
`use_cache=False` (reference pipeline.py:208), recomputing the full
prefix per token. This module is the opposite end of that axis.

Greedy-only by design: the pipeline flag (`PipelineConfig
.llm_speculative_layers`) coerces sampling to temperature 0, which is
the regime where exactness is definable without rejection-sampling
bookkeeping.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import llama
from .generate import GenerateResult


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "eos_id", "draft_layers", "k_draft",
        "max_len",
    ),
)
def generate_speculative(
    params,
    cfg: llama.LlamaConfig,
    inputs_embeds: jax.Array,  # (1, S, D) — already multimodal-spliced
    max_new_tokens: int = 100,
    eos_id: int = 2,
    draft_layers: int = 4,
    k_draft: int = 4,
    max_len: Optional[int] = None,
) -> GenerateResult:
    """Greedy decode via draft/verify rounds; exact vs `generate(...,
    temperature=0.0)`. Single-row batches only (per-round advance is a
    scalar cache length; the batched server keeps the plain scan).

    Per round: `k_draft-1` single-token forwards through the first
    `draft_layers` layers (sharing the full model's KV cache slice —
    the verify pass recomputes identical K/V for those layers, so
    rejected slots are either overwritten or masked), then ONE
    full-model forward over the k_draft-token window. The full model's
    greedy tokens g_0..g_{k-1} at those positions are the candidates;
    accepted drafts satisfy d_{i+1} == g_i, so the emitted tokens are
    simply g_0..g_j — every output token is the full model's argmax.
    """
    assert inputs_embeds.shape[0] == 1, "speculative decode is single-row"
    L = draft_layers
    assert 0 < L < cfg.num_layers
    b, s, d = inputs_embeds.shape
    # cache slack: the last verify round may write up to k_draft-1
    # positions past the final accepted token
    max_len = max_len or (s + max_new_tokens + k_draft)
    cache = llama.KVCache.create(cfg, b, max_len=max_len, dtype=inputs_embeds.dtype)

    out = llama.forward(params, cfg, inputs_embeds=inputs_embeds, cache=cache)
    cache = out["cache"]
    tok0 = jnp.argmax(out["logits"][:, -1], axis=-1)
    h0 = out["hidden_norm"][:, -1]

    buf_t = max_new_tokens + k_draft  # round writes may overhang; trimmed
    tokens0 = jnp.full((b, buf_t), eos_id, tok0.dtype).at[:, 0].set(tok0)
    hiddens0 = jnp.zeros((b, buf_t, d), h0.dtype).at[:, 0].set(h0)

    def cond(state):
        n_out, done, *_ = state
        return (n_out < max_new_tokens) & ~done

    def body(state):
        n_out, done, tok, cache, tokens, hiddens = state

        # ---- draft: k_draft-1 early-exit steps on the sliced cache
        dcache = llama.KVCache(cache.k[:L], cache.v[:L], cache.length)
        window = [tok]
        dt = tok
        for _ in range(k_draft - 1):
            dout = llama.forward(
                params, cfg, inputs_embeds=llama.embed(params, dt[:, None]),
                cache=dcache, layers=L,
            )
            dcache = dout["cache"]
            dt = jnp.argmax(dout["logits"][:, -1], axis=-1)
            window.append(dt)

        # ---- verify: one full forward over [tok, d_1 .. d_{k-1}]
        w_ids = jnp.stack(window, axis=1)  # (1, k)
        vout = llama.forward(
            params, cfg, inputs_embeds=llama.embed(params, w_ids), cache=cache,
        )
        g = jnp.argmax(vout["logits"], axis=-1)  # (1, k) full-model greedy
        # leading accepts: d_{i+1} == g_i for i in 0..k-2
        acc = (w_ids[:, 1:] == g[:, :-1]).astype(jnp.int32)
        j = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)[0]  # scalar, 0..k-1

        # emitted this round: g_0..g_j (accepted drafts ARE g_0..g_{j-1})
        # — but never beyond the first EOS among them
        idx = jnp.arange(k_draft)
        is_eos = (g[0] == eos_id) & (idx <= j)
        first_eos = jnp.where(jnp.any(is_eos), jnp.argmax(is_eos), k_draft)
        n_emit = jnp.minimum(j + 1, first_eos + 1).astype(jnp.int32)

        tokens = jax.lax.dynamic_update_slice_in_dim(tokens, g, n_out, axis=1)
        hiddens = jax.lax.dynamic_update_slice_in_dim(
            hiddens, vout["hidden_norm"], n_out, axis=1
        )
        # cache holds [.., tok, d_1..d_{k-1}]; valid history after the
        # round is the old n, plus tok, plus the accepted drafts (the
        # next fed token is the correction g_j, not yet cached) — stale
        # tail slots are masked by length and overwritten next round
        new_len = cache.length + 1 + (n_emit - 1)
        cache = llama.KVCache(vout["cache"].k, vout["cache"].v, new_len)
        tok = g[:, n_emit - 1]  # correction = last emitted token
        done = done | jnp.any(is_eos)
        return (n_out + n_emit, done, tok, cache, tokens, hiddens)

    n_out, _, _, _, tokens, hiddens = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(1, jnp.int32), tok0[0] == eos_id, tok0, cache,
         tokens0, hiddens0),
    )
    tokens = tokens[:, :max_new_tokens]
    hiddens = hiddens[:, :max_new_tokens]
    # overhang past n_out is stale garbage from the last round's window;
    # normalize it to eos so done_at/trim semantics match generate()
    col = jnp.arange(max_new_tokens)[None, :]
    tokens = jnp.where(col < n_out, tokens, eos_id)
    stopped = tokens == eos_id
    done_at = jnp.where(
        jnp.any(stopped, axis=1), jnp.argmax(stopped, axis=1), max_new_tokens
    )
    return GenerateResult(tokens, hiddens, done_at)
