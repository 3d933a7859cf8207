"""Decode-step attribution at full 7B size (VERDICT r3 item 5 residual):
the int4-grouped LLM stage runs 6.4 ms/tok vs the ~4.3 ms weight-stream
floor — this harness splits one decode step into its pieces so the
remaining ~2 ms is attributed, not guessed.

Pieces (each timed with the two-point fori_loop method, weights as loop
arguments; the full step carries the KV cache through the loop so the
dynamic_update_slice aliases in place exactly as the production scan):

  full        one `llama.forward` decode step (cache len ~mid-decode),
              incl. lm_head — the production graph per token
  qmv_chain   only the 4 fused matvec kernels/layer, data-chained
  lm_head     the int8 lane-unaligned vocab matvec alone
  glue        the full per-layer graph with every linear replaced by a
              rank-preserving fake (norms, rope, cache update, cached
              attention, residuals — the XLA chain between kernels)

full - (qmv_chain + lm_head + glue) ≈ scheduling gaps the pieces can't
see in isolation (pallas/XLA interleave stalls).

Run alone on the real chip from the repo root:
    python benchmarks/decode_attrib.py [--quant int4|int4pc|int8]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.models import llama
from instructany2pix_tpu.models import layers as L
from instructany2pix_tpu.ops import quant as quant_lib

CACHE_LEN = 178  # mid-decode of the bench's 128-prompt + 100-token run
MAX_LEN = 256


def two_point(loop_fn, args, iters, reps=3):
    """(T(2N)-T(N))/N over a jitted dynamic-trip fori_loop; dispatch and
    tunnel-sync costs cancel."""
    f = jax.jit(loop_fn)
    float(jnp.sum(f(iters, *args).astype(jnp.float32)))
    float(jnp.sum(f(2 * iters, *args).astype(jnp.float32)))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(iters, *args).astype(jnp.float32)))
        t1 = time.perf_counter()
        float(jnp.sum(f(2 * iters, *args).astype(jnp.float32)))
        t2 = time.perf_counter()
        deltas.append((t2 - t1) - (t1 - t0))
    deltas.sort()
    return max(deltas[len(deltas) // 2], 1e-9) / iters


def build_params(cfg, quant):
    t0 = time.perf_counter()

    @jax.jit
    def _init(k):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), llama.init(k, cfg)
        )

    params = _init(jax.random.key(0))
    jax.block_until_ready(params)
    print(f"init 7B bf16: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    params = quant_lib.quantize_llama(
        params, bits=8 if quant == "int8" else 4, free_originals=True,
        int4_grouped=(quant == "int4"),
    )
    jax.block_until_ready(params)
    params = llama.fuse_projections(params)
    print(f"{quant} quantize+fuse: {time.perf_counter()-t0:.1f}s", flush=True)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int4",
                    choices=["int4", "int4pc", "int8"])
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    cfg = llama.LlamaConfig.vicuna_7b()
    print("device:", jax.devices(), flush=True)
    params = build_params(cfg, args.quant)

    d = cfg.hidden_size
    x0 = jax.random.normal(jax.random.key(1), (1, 1, d), jnp.bfloat16)

    # ---- full decode step, cache carried through the loop -------------
    cache0 = llama.KVCache.create(cfg, 1, MAX_LEN)
    cache0 = cache0._replace(length=jnp.asarray(CACHE_LEN, jnp.int32))

    def full_loop(n, x, ck, cv, clen, params):
        def body(i, carry):
            x, ck, cv = carry
            out = llama.forward(
                params, cfg, inputs_embeds=x,
                cache=llama.KVCache(ck, cv, clen),
            )
            nc = out["cache"]
            # feed the hidden back (keeps the chain live); length pinned
            # so shapes/positions stay identical each iteration
            nx = x + 1e-7 * out["hidden"].astype(x.dtype)
            return (nx, nc.k, nc.v)

        x, ck, cv = jax.lax.fori_loop(0, n, body, (x, ck, cv))
        return x

    t_full = two_point(
        full_loop, (x0, cache0.k, cache0.v, cache0.length, params),
        args.iters,
    )
    print(f"full decode step : {t_full*1e3:7.3f} ms", flush=True)

    # ---- qmv chain only ------------------------------------------------
    inter = cfg.intermediate_size

    def qmv_loop(n, h, params):
        def body(i, h):
            for li in range(cfg.num_layers):
                p = params[f"layer_{li}"]
                qkv = L.linear(p["qkv"], h)
                o = L.linear(p["o"], qkv[:, :d])
                gu = L.linear(p["gate_up"], o)
                dn = L.linear(p["down"], gu[:, :inter])
                h = h + 1e-7 * dn.astype(h.dtype)
            return h

        return jax.lax.fori_loop(0, n, body, h)

    h0 = jax.random.normal(jax.random.key(2), (1, d), jnp.bfloat16)
    t_qmv = two_point(qmv_loop, (h0, params), args.iters)
    print(f"qmv chain (4/layer): {t_qmv*1e3:7.3f} ms", flush=True)

    # ---- lm_head alone -------------------------------------------------
    def head_loop(n, h, params):
        def body(i, h):
            logits = L.linear(params["lm_head"], h)
            return h + 1e-7 * jnp.mean(logits).astype(h.dtype)

        return jax.lax.fori_loop(0, n, body, h)

    t_head = two_point(head_loop, (h0, params), args.iters)
    print(f"lm_head matvec   : {t_head*1e3:7.3f} ms", flush=True)

    # ---- glue: the per-layer XLA chain with fake linears ----------------
    real_linear = L.linear

    def fake_linear(p, x, compute_dtype=None, norm=None, swiglu=False,
                    residual=None):
        # the fused kwargs (norm/swiglu/residual) ride the REAL kernels
        # now, so the fake drops them from the glue graph too — glue
        # measures only what XLA still runs between kernels; residual
        # keeps its data dep so the adds stay in the graph
        if "w" in p:
            out_dim = p["w"].shape[-1]
        else:
            # quantized dict: scales carry the out dim on their last axis
            out_dim = p.get("scale", p.get("gscale")).shape[-1]
        s = jnp.sum(x, axis=-1, keepdims=True)  # keeps the data dep
        y = jnp.broadcast_to(s, x.shape[:-1] + (out_dim,)) * 1e-7
        return y + residual if residual is not None else y

    def glue_loop(n, x, ck, cv, clen, params):
        def body(i, carry):
            x, ck, cv = carry
            L.linear = fake_linear
            try:
                out = llama.forward(
                    params, cfg, inputs_embeds=x,
                    cache=llama.KVCache(ck, cv, clen),
                )
            finally:
                L.linear = real_linear
            nc = out["cache"]
            nx = x + 1e-7 * out["hidden"].astype(x.dtype)
            return (nx, nc.k, nc.v)

        x, ck, cv = jax.lax.fori_loop(0, n, body, (x, ck, cv))
        return x

    t_glue = two_point(
        glue_loop, (x0, cache0.k, cache0.v, cache0.length, params),
        args.iters,
    )
    print(f"glue (no linears): {t_glue*1e3:7.3f} ms", flush=True)

    gap = t_full - (t_qmv + t_head + t_glue)
    print(
        f"\nfull {t_full*1e3:.3f} = qmv {t_qmv*1e3:.3f} + head "
        f"{t_head*1e3:.3f} + glue {t_glue*1e3:.3f} + GAP {gap*1e3:.3f} ms",
        flush=True,
    )
    floor = 0.0
    for li in range(cfg.num_layers):
        p = params[f"layer_{li}"]
        for kk in ("qkv", "o", "gate_up", "down"):
            for leaf in jax.tree.leaves(p[kk]):
                floor += leaf.size * leaf.dtype.itemsize
    for leaf in jax.tree.leaves(params["lm_head"]):
        floor += leaf.size * leaf.dtype.itemsize
    print(f"weight-stream floor (packed bytes/819GB/s): "
          f"{floor/819e9*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
