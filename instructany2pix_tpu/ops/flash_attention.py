"""Pallas TPU flash attention (forward) with custom VJP.

This is the TPU-native replacement for the reference's attention stack:
PyTorch SDPA in the diffusion attention processors (reference
diffusion/ip_adapter/attention_processor.py:259) and the vendored —
never-imported — Triton flash kernel (reference
llm/model/language_model/mpt/flash_attn_triton.py:51,306). Here the
kernel is live: it backs the Llama-class LLM and the SDXL UNet
self-attention.

Design:
  * shapes (B, H, S, D); grid over (B*H, q-blocks); K/V for one (b, h)
    resident in VMEM; online-softmax inner loop over k-blocks via
    `jax.lax.fori_loop`.
  * fp32 accumulation for logits/softmax state, bf16 MXU inputs.
  * causal masking prunes fully-masked k-blocks through the loop upper
    bound (no wasted MXU work past the diagonal).
  * backward pass recomputes attention blockwise (flash-style, O(S)
    memory) in plain XLA einsums — correct and remat-friendly; a
    Pallas bwd kernel can swap in behind the same custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Block sweep at (2,10,4096,64) on v5e (r3, roundtrip-corrected):
# 512/1024 blocks run 63.8 TFLOP/s vs 58.8 for 512/512 and 23.2 for
# the XLA path — bigger q blocks amortize the online-softmax rescale,
# bigger k blocks lengthen the MXU contractions; the kernel clamps
# both to the padded sequence length for short inputs. K/V for one
# (b, h) stay fully VMEM-resident, which caps single-call seq at
# ~8k on v5e (16 MB VMEM) — longer sequences go through
# parallel/ring_attention.py.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k, causal, scale, seq_q, seq_k
):
    # q_ref: (1, block_q, d) for one (b, h, q-block); k/v_ref: (1, seq_k, d)
    block_q = q_ref.shape[1]
    d = q_ref.shape[2]
    qi = pl.program_id(1)
    # Operands stay in the INPUT dtype (bf16 on the serving path): the
    # v5e MXU is bf16-native, and an f32×f32 dot is emulated at ~1/4
    # rate. Accumulation is f32 (preferred_element_type) and the scale
    # is applied to the f32 logits, so softmax sees full precision —
    # identical numerics class to _reference_attention.
    q = q_ref[0]
    # Causality aligns q and k at the END (KV-cache convention): q row i
    # attends to keys <= i + (seq_k - seq_q).
    causal_offset = seq_k - seq_q

    num_kb = pl.cdiv(seq_k, block_k)
    if causal:
        q_end = (qi + 1) * block_q + causal_offset
        num_kb = jnp.minimum(num_kb, pl.cdiv(q_end, block_k))

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = (
            jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (block_q, block_k)
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = col < seq_k
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            valid = jnp.logical_and(valid, col <= row + causal_offset)
        s = jnp.where(valid, s, NEG_INF)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype),
            v_blk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # logsumexp per row — saved for the Pallas backward recompute
    lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_fwd(q, k, v, causal, scale, block_q, block_k, interpret=False,
               return_lse=False):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    sq_p, sk_p = _round_up(sq, block_q), _round_up(sk, block_k)
    qp = _pad_to(q, sq_p, 2).reshape(b * h, sq_p, d)
    kp = _pad_to(k, sk_p, 2).reshape(b * h, sk_p, d)
    vp = _pad_to(v, sk_p, 2).reshape(b * h, sk_p, d)

    grid = (b * h, sq_p // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel,
            block_k=block_k,
            causal=causal,
            scale=scale,
            seq_q=sq,
            seq_k=sk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, sk_p, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, sk_p, d), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_p, 1), jnp.float32),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    o = out[0].reshape(b, h, sq_p, d)[:, :, :sq, :]
    if return_lse:
        return o, out[1].reshape(b, h, sq_p)[:, :, :sq]
    return o


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# Flash attention with SAM-style decomposed 2D relative-position bias.
#
# SAM's ViT global blocks add logits bias b[t, u*g+v] = bh[t, u] + bw[t, v]
# over a g×g key grid (segment_anything add_decomposed_rel_pos). The XLA
# formulation materializes the biased (B, H, N, N) f32 logits — ~1 GB at
# N=4096 — costing ~25 ms/block on v5e. Here the k-block is ONE key-grid
# row (block_k = g), so the bias lands without any lane-crossing reshape:
# bh contributes one scalar per (query, k-block) and bw one g-lane vector
# per query. Inference-only (SAM encode has no training path here).


def _flash_relpos2d_kernel(
    q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, *, scale, grid_w, block_k
):
    block_q = q_ref.shape[1]
    d = q_ref.shape[2]
    g = grid_w
    rows = block_k // g  # key-grid rows per iteration
    q = q_ref[0]
    # bw repeats every g lanes across the block_k-wide logits tile; bh is
    # constant within a row. Both land via lane-aligned ops: bw by a
    # static tile, bh by a (block_q, g)·(g, block_k) selection matmul —
    # Mosaic cannot load a dynamic single-lane slice, but a dot with a
    # dynamically-built selection matrix is fine.
    bw = bw_ref[0].astype(jnp.float32)  # (block_q, g)
    bw_t = jnp.concatenate([bw] * rows, axis=1)  # (block_q, block_k)
    bh_all = bh_ref[0].astype(jnp.float32)  # (block_q, g)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (g, block_k), 1) // g
    src_row = jax.lax.broadcasted_iota(jnp.int32, (g, block_k), 0)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = (
            jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (block_q, block_k)
        sel = (src_row == kb * rows + lane_row).astype(jnp.float32)
        bh_blk = jax.lax.dot_general(
            bh_all, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        s = s + bh_blk + bw_t
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc * alpha + pv, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, (g * g) // block_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_attention_relpos2d(
    q, k, v, bh, bw, *, scale=None, block_q=DEFAULT_BLOCK_Q,
    block_k=None, interpret=False
):
    """Attention over a g×g token grid with decomposed rel-pos bias.

    q/k/v: (B, H, N, D) with N = g²; bh/bw: (B, H, N, g) where the logit
    for query t and key (u, v) is q·k*scale + bh[t, u] + bw[t, v].
    Forward-only (no vjp) — serving path for SAM's global ViT blocks.
    `block_k` must be a multiple of g (defaults to min(8·g, N)).
    """
    b, h, n, d = q.shape
    g = int(round(n**0.5))
    assert g * g == n, "relpos2d attention needs a square token grid"
    if block_k is None:
        # block_k = r·g with r | g so that block_k | n = g²; largest
        # r ≤ 8 (the measured sweet spot at g=64 → block_k 512)
        r = max(x for x in range(1, min(8, g) + 1) if g % x == 0)
        block_k = r * g
    assert block_k % g == 0 and n % block_k == 0
    scale = scale if scale is not None else d**-0.5
    block_q = min(block_q, _round_up(n, 128))
    n_p = _round_up(n, block_q)
    qp = _pad_to(q, n_p, 2).reshape(b * h, n_p, d)
    kp = k.reshape(b * h, n, d)
    vp = v.reshape(b * h, n, d)
    bhp = _pad_to(bh, n_p, 2).reshape(b * h, n_p, g)
    bwp = _pad_to(bw, n_p, 2).reshape(b * h, n_p, g)

    out = pl.pallas_call(
        functools.partial(
            _flash_relpos2d_kernel, scale=scale, grid_w=g, block_k=block_k
        ),
        grid=(b * h, n_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bhid, i: (bhid, i, 0)),
            pl.BlockSpec((1, n, d), lambda bhid, i: (bhid, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bhid, i: (bhid, 0, 0)),
            pl.BlockSpec((1, block_q, g), lambda bhid, i: (bhid, i, 0)),
            pl.BlockSpec((1, block_q, g), lambda bhid, i: (bhid, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bhid, i: (bhid, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_p, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bhp, bwp)
    return out.reshape(b, h, n_p, d)[:, :, :n, :]


def _reference_attention(q, k, v, causal, scale):
    # operands stay in their input dtype (bf16 on the fast path — fp32
    # OPERANDS would halve the MXU rate); accumulation is fp32, so the
    # logits feeding softmax keep full precision
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    s = s * scale
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        mask = jnp.tril(jnp.ones((sq, sk), bool), k=sk - sq)
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def _bwd_recompute(q, k, v, o, g, causal, scale):
    """Recompute backward in XLA from saved (q, k, v, o) — O(S^2) logits
    materialized, fp32 math; XLA fuses the softmax chain. Swap for a
    Pallas bwd kernel if training memory becomes the constraint."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if causal:
        mask = jnp.tril(jnp.ones((sq, sk), bool), k=sk - sq)
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    delta = jnp.sum(gf * o.astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)




# ----------------------------------------------------------- pallas bwd


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref,
    *, block_k, causal, scale, seq_q, seq_k,
):
    block_q = q_ref.shape[1]
    qi = pl.program_id(1)
    # Input-dtype operands for every MXU dot (see _flash_fwd_kernel);
    # logits/probabilities/accumulators stay f32.
    q = q_ref[0]
    g = g_ref[0]
    lse = lse_ref[0]  # (block_q, 1)
    delta = delta_ref[0]
    causal_offset = seq_k - seq_q

    num_kb = pl.cdiv(seq_k, block_k)
    if causal:
        q_end = (qi + 1) * block_q + causal_offset
        num_kb = jnp.minimum(num_kb, pl.cdiv(q_end, block_k))

    def body(kb, dq):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = col < seq_k
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            valid = jnp.logical_and(valid, col <= row + causal_offset)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            g, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(
        0, num_kb, body, jnp.zeros(q.shape, jnp.float32)
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, block_q, causal, scale, seq_q, seq_k,
):
    block_k = k_ref.shape[1]
    ki = pl.program_id(1)
    k = k_ref[0]
    v = v_ref[0]
    causal_offset = seq_k - seq_q

    num_qb = pl.cdiv(seq_q, block_q)
    if causal:
        # first q row that can see this k block: row >= k_start - offset
        q_start = jnp.maximum(ki * block_k - causal_offset, 0)
        qb0 = q_start // block_q
    else:
        qb0 = 0

    def body(qb, carry):
        dk, dv = carry
        q_blk = q_ref[0, pl.ds(qb * block_q, block_q), :]
        g_blk = g_ref[0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(qb * block_q, block_q)]  # (block_q, 1)
        delta = delta_ref[0, pl.ds(qb * block_q, block_q)]
        s = jax.lax.dot_general(
            q_blk, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        row = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = jnp.logical_and(row < seq_q, col < seq_k)
        if causal:
            valid = jnp.logical_and(valid, col <= row + causal_offset)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dv = dv + jax.lax.dot_general(
            p.astype(g_blk.dtype), g_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g_blk, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(
            ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    dk, dv = jax.lax.fori_loop(qb0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse, g, causal, scale, block_q, block_k, interpret=False):
    """O(S)-memory flash backward: dq over q-blocks, dk/dv over k-blocks,
    attention recomputed from the saved logsumexp."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    sq_p, sk_p = _round_up(sq, block_q), _round_up(sk, block_k)
    qp = _pad_to(q, sq_p, 2).reshape(b * h, sq_p, d)
    kp = _pad_to(k, sk_p, 2).reshape(b * h, sk_p, d)
    vp = _pad_to(v, sk_p, 2).reshape(b * h, sk_p, d)
    gp = _pad_to(g, sq_p, 2).reshape(b * h, sq_p, d)
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (b, h, sq)
    dp_ = _pad_to(delta, sq_p, 2).reshape(b * h, sq_p, 1)
    lp = _pad_to(lse, sq_p, 2).reshape(b * h, sq_p, 1)

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, block_k=block_k, causal=causal, scale=scale,
            seq_q=sq, seq_k=sk,
        ),
        grid=(b * h, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, sk_p, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, sk_p, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, gp, lp, dp_)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, block_q=block_q, causal=causal, scale=scale,
            seq_q=sq, seq_k=sk,
        ),
        grid=(b * h, sk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, sq_p, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, sq_p, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, sq_p, 1), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, sq_p, 1), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i: (bh, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk_p, d), v.dtype),
        ),
        interpret=interpret,
    )(qp, kp, vp, gp, lp, dp_)

    dq = dq.reshape(b, h, sq_p, d)[:, :, :sq]
    dk = dk.reshape(b, h, sk_p, d)[:, :, :sk]
    dv = dv.reshape(b, h, sk_p, d)[:, :, :sk]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention(
    q,
    k,
    v,
    causal: bool = False,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
):
    """Fused attention over (B, H, S, D) tensors.

    `interpret=True` runs the Pallas kernel in interpreter mode (CPU
    tests exercise the exact kernel logic this way).
    """
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    return _flash_fwd(q, k, v, causal, scale, block_q, block_k, interpret)


def _fwd(q, k, v, causal, scale, block_q, block_k, interpret):
    s = scale if scale is not None else q.shape[-1] ** -0.5
    o, lse = _flash_fwd(
        q, k, v, causal, s, block_q, block_k, interpret, return_lse=True
    )
    return o, (q, k, v, o, lse)


def _bwd(causal, scale, block_q, block_k, interpret, res, g):
    q, k, v, o, lse = res
    s = scale if scale is not None else q.shape[-1] ** -0.5
    # Backward routing (measured on v5e): XLA autodiff-style recompute is
    # faster up to ~4k tokens (its O(S^2) logits still fit); the Pallas
    # blocked bwd trades speed for O(S) memory at long sequences.
    # Override with IA2P_FLASH_BWD=pallas|xla.
    import os

    choice = os.environ.get("IA2P_FLASH_BWD", "auto")
    use_pallas = choice == "pallas" or (choice == "auto" and q.shape[2] > 4096)
    if use_pallas or interpret:
        return _flash_bwd(q, k, v, o, lse, g, causal, s, block_q, block_k, interpret)
    return _bwd_recompute(q, k, v, o, g, causal, s)


flash_attention.defvjp(_fwd, _bwd)
