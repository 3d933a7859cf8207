"""KV-cached sampling loop with per-step hidden-state capture.

Replaces the reference's HF `generate(..., use_cache=False,
output_hidden_states=True)` call (reference pipeline.py:201-211) which
recomputes the full sequence per token. Here: one prefill + `lax.scan`
decode, O(T) per token, capturing the post-final-norm hidden state of
each step — `hiddens[i]` is the state that *sampled* `tokens[i]`,
matching the reference readout `hidden_states[i][-1][:, -1:]`
(pipeline.py:236 and the assert at pipeline.py:214).

Stopping: EOS always stops; `stop_sequences` adds arbitrary multi-token
keyword stopping — the jit-compatible counterpart of the reference's
`KeywordsStoppingCriteria` (llm/mm_utils.py:77-107), implemented as a
rolling window of the last K emitted ids matched against each keyword's
id suffix inside the scan. The scan is fixed-length with a done flag;
the host trims at `done_at` (index of EOS or of the keyword's final
token, so the keyword itself survives into the decoded text like the
reference's criteria, which stop *after* the keyword is emitted).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models import llama


class GenerateResult(NamedTuple):
    tokens: jax.Array  # (B, T) sampled ids (garbage after EOS)
    hiddens: jax.Array  # (B, T, D) hidden that predicted tokens[:, i]
    done_at: jax.Array  # (B,) index of first stop token (T if none)


def keyword_stop_sequences(tokenizer, keywords: Sequence[str]) -> Tuple[Tuple[int, ...], ...]:
    """Keyword strings → token-id suffixes for `generate(stop_sequences=)`.
    Mirrors the reference's id-level path (mm_utils.py:84-92): encode
    each keyword, drop a leading BOS if the tokenizer added one."""
    out = []
    for kw in keywords:
        ids = list(tokenizer.encode(kw) if hasattr(tokenizer, "encode") else tokenizer(kw).input_ids)
        bos = getattr(tokenizer, "bos_token_id", None)
        if len(ids) > 1 and bos is not None and ids[0] == bos:
            ids = ids[1:]
        if ids:
            out.append(tuple(int(i) for i in ids))
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "temperature", "eos_id", "max_len", "bucket",
        "stop_sequences", "dynamic_stop",
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
    stop_sequences: Tuple[Tuple[int, ...], ...] = (),
    prefix_pads: Optional[jax.Array] = None,
    dynamic_stop: bool = False,
) -> GenerateResult:
    b, s, _ = inputs_embeds.shape
    # prompt-length bucketing: left-pad to a multiple of `bucket` so the
    # number of distinct compiled graphs is bounded (serving latency);
    # pad slots are masked out of attention and position numbering.
    # `prefix_pads` (B,) covers the batched-serving case: the caller
    # already left-padded each row to a common length.
    prefix_pad: object = 0
    if prefix_pads is not None:
        prefix_pad = prefix_pads
    elif bucket is not None:
        padded = -(-s // bucket) * bucket
        pp = padded - s
        if pp:
            inputs_embeds = jnp.pad(inputs_embeds, ((0, 0), (pp, 0), (0, 0)))
            s = padded
        prefix_pad = pp
    max_len = max_len or (s + max_new_tokens)
    pp_arg = prefix_pad if (
        prefix_pads is not None or (isinstance(prefix_pad, int) and prefix_pad)
    ) else None
    cache = llama.KVCache.create(cfg, b, max_len=max_len, dtype=inputs_embeds.dtype)

    out = llama.forward(
        params, cfg, inputs_embeds=inputs_embeds, cache=cache,
        prefix_pad=pp_arg,
    )
    cache = out["cache"]
    h_last = out["hidden_norm"][:, -1]  # predicts the first sampled token
    logits_last = out["logits"][:, -1]

    # `key` may be one key (whole batch) or (B,) keys — then row i's
    # sampling stream depends only on key[i], so a microbatched server
    # keeps per-request seed determinism (serving.PipelineServer)
    per_row_keys = getattr(key, "ndim", 0) == 1

    def split2(k):
        if per_row_keys:
            pair = jax.vmap(lambda kk: jax.random.split(kk, 2))(k)
            return pair[:, 0], pair[:, 1]
        return jax.random.split(k)

    def sample(logits, k):
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1)
        lg = logits.astype(jnp.float32) / temperature
        if per_row_keys:
            return jax.vmap(jax.random.categorical)(k, lg)
        return jax.random.categorical(k, lg)

    # rolling window of the last K emitted ids for keyword matching
    k_win = max([len(sq) for sq in stop_sequences], default=0)

    def push(recent, tok):
        if k_win == 0:
            return recent
        return jnp.concatenate([recent[:, 1:], tok[:, None]], axis=1)

    def match_stop(recent, tok):
        """True where the newest suffix completes EOS or any keyword."""
        m = tok == eos_id
        for sq in stop_sequences:
            seq = jnp.asarray(sq, recent.dtype) if k_win else None
            m = m | jnp.all(recent[:, k_win - len(sq):] == seq, axis=1)
        return m

    key, k0 = split2(key)
    tok0 = sample(logits_last, k0)
    recent0 = jnp.full((b, max(k_win, 1)), -1, tok0.dtype)
    recent0 = push(recent0, tok0) if k_win else recent0
    stop0 = match_stop(recent0, tok0)

    def step(carry, _):
        cache, tok, recent, done, key = carry
        key, k = split2(key)
        emb = llama.embed(params, tok[:, None])
        out = llama.forward(
            params, cfg, inputs_embeds=emb, cache=cache,
            prefix_pad=pp_arg,
        )
        nxt = jnp.where(done, eos_id, sample(out["logits"][:, -1], k))
        recent = push(recent, nxt)
        stop = match_stop(recent, nxt)
        done_next = done | stop
        return (out["cache"], nxt, recent, done_next, key), (
            nxt, out["hidden_norm"][:, -1], stop & ~done
        )

    if not dynamic_stop:
        carry = (cache, tok0, recent0, stop0, key)
        (_, _, _, _, _), (toks, hids, stops) = jax.lax.scan(
            step, carry, None, length=max_new_tokens - 1
        )
        tokens = jnp.concatenate([tok0[:, None], jnp.moveaxis(toks, 0, 1)], axis=1)
        hiddens = jnp.concatenate([h_last[:, None], jnp.moveaxis(hids, 0, 1)], axis=1)
        stopped = jnp.concatenate([stop0[:, None], jnp.moveaxis(stops, 0, 1)], axis=1)
    else:
        # early-exit decode: a while_loop that stops once EVERY row hit
        # EOS/keyword — interactive latency scales with the actual
        # output length instead of max_new_tokens (the fixed-length scan
        # remains the batcher's predictable-cost path)
        d = h_last.shape[-1]
        tokens0 = jnp.full((b, max_new_tokens), eos_id, tok0.dtype)
        tokens0 = tokens0.at[:, 0].set(tok0)
        hiddens0 = jnp.zeros((b, max_new_tokens, d), h_last.dtype)
        hiddens0 = hiddens0.at[:, 0].set(h_last)
        stopped0_buf = jnp.zeros((b, max_new_tokens), bool).at[:, 0].set(stop0)

        def cond(state):
            i, carry, *_ = state
            done = carry[3]
            return (i < max_new_tokens) & ~jnp.all(done)

        def body(state):
            i, carry, tokens, hiddens, stopped = state
            carry, (nxt, h, stop) = step(carry, None)
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, nxt[:, None], i, axis=1
            )
            hiddens = jax.lax.dynamic_update_slice_in_dim(
                hiddens, h[:, None], i, axis=1
            )
            stopped = jax.lax.dynamic_update_slice_in_dim(
                stopped, stop[:, None], i, axis=1
            )
            return (i + 1, carry, tokens, hiddens, stopped)

        carry = (cache, tok0, recent0, stop0, key)
        _, _, tokens, hiddens, stopped = jax.lax.while_loop(
            cond, body, (jnp.asarray(1), carry, tokens0, hiddens0, stopped0_buf)
        )
    done_at = jnp.where(
        jnp.any(stopped, axis=1), jnp.argmax(stopped, axis=1), max_new_tokens
    )
    return GenerateResult(tokens, hiddens, done_at)
