"""Weight-only quantization for bandwidth-bound decode.

The reference squeezes its 7B LLM onto one GPU with bitsandbytes NF4
(reference pipeline.py:30 `load_in_4bit=True`). On TPU the equivalent
win is bandwidth, not capacity: KV-cached decode reads every weight once
per token, so int8 weights halve the HBM traffic and roughly halve
decode latency on a v5e (int4 packed halves it again). Layout:

  {"w": (in, out) fp}  →  {"w_q": (in, out) int8, "scale": (out,) f32}

Per-output-channel symmetric absmax scales. `models.layers.linear`
dispatches on the presence of "w_q" — any linear in any model can be
quantized without touching forward code. Inside the decode scan, XLA
fuses the int8→bf16 convert into the dot's operand read, so the bf16
kernel never materializes in HBM (decode-latency evidence in
BASELINE.md: 10.1 ms/token ≈ the int8 floor, not the 16.5 ms bf16
floor).

int4 uses the same contract with two nibbles packed per int8 byte
("w_q4", (in/2, out), even/odd-interleaved rows — `_pack_nibbles`),
with either per-channel
"scale" (N,) or blockwise "gscale" (K/128, N) — the NF4/GPTQ-class
scheme matching the reference's bnb-NF4 quality. STATUS (r2, v5e):
decode (M≤16) routes through `pallas_qmatmul` via `layers.linear` —
in-loop matvec at 7B shapes: int4 66 µs / int4-grouped 77 µs / int8
85 µs vs 121 µs for the XLA fused-dequant path; full 7B
prefill+100-tok decode: 724 / 905 / 973 ms (with fused qkv+gate_up,
`llama.fuse_projections`). Prefill and CPU stay on the XLA path.
"""

from __future__ import annotations

import os
import re
from typing import Callable, Optional

import jax
import jax.numpy as jnp

# A/B knob for the grouped-int4 kernel body (BASELINE.md r3): "chain"
# (default) accumulates one partial dot per scale group; "tile" scales
# the dequantized tile blockwise then runs one full-K dot. Read ONCE at
# import: jit caches traced variants by shape/dtype, so flipping an env
# var mid-process would silently keep returning the previously-traced
# variant for already-seen shapes — set it before the first trace.
_QMV_GROUPED_VARIANT = os.environ.get("IA2P_QMV_GROUPED", "chain")

# Weight-stream pipelining for the decode matvec: "stream" (default)
# rotates IA2P_QMV_NBUF manually managed VMEM buffers with up to
# nbuf-1 async copies in flight — the Mosaic grid pipeline keeps only
# ONE copy outstanding, which under-subscribes the HBM controller
# (measured r5, benchmarks/qmv_dma_probe.py: up-gate 4096x11008
# 44.5→32.7 µs = 1.62x→1.19x of the packed-bytes floor; o-proj
# 15.6→13.4; qkv 40.4→38.7; down 36.2→35.5; bit-exact). "grid" keeps
# the r4 single-buffered grid kernel (and always serves interpret/CPU).
_QMV_PIPE = os.environ.get("IA2P_QMV_PIPE", "stream")
_QMV_NBUF = int(os.environ.get("IA2P_QMV_NBUF", "4"))
_QMV_STREAM_BN = int(os.environ.get("IA2P_QMV_STREAM_BN", "256"))


def quantize_weight(w: jax.Array) -> dict:
    """(in, out) float weights → int8 + per-out-channel scale."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)  # (out,)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale}


def dequantize_weight(q: dict, dtype=jnp.float32) -> jax.Array:
    return q["w_q"].astype(dtype) * q["scale"].astype(dtype)[None, :]


def _pack_nibbles(q: jax.Array) -> jax.Array:
    """(in, out) int8 values in [-7,7] → (in/2, out) packed bytes,
    EVEN/ODD interleaved: row 2i in the low nibble, row 2i+1 in the
    high nibble of byte row i. This is exactly the layout
    `pltpu.bitcast(packed, int4)` reinterprets back into original row
    order (out[2i]=lo(in[i]), out[2i+1]=hi(in[i]) — probed on this
    toolchain, deterministic, signed) — so the decode kernel's unpack
    is ONE native int4 convert instead of a shift/mask/concat VPU
    chain, and scale groups stay contiguous."""
    lo = q[0::2] & 0x0F
    hi = (q[1::2] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def quantize_weight_int4(w: jax.Array) -> dict:
    """(in, out) → packed int4 + per-channel scale. `in` must be even;
    packing layout in `_pack_nibbles`."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[None, :]), -7, 7).astype(jnp.int8)
    return {"w_q4": _pack_nibbles(q), "scale": scale}


def quantize_weight_int4_grouped(w: jax.Array, group: int = 128) -> dict:
    """(in, out) → packed int4 + per-(group, out) scales. Blockwise
    scales along the contraction dim are what make 4-bit weight-only
    usable on a 7B (the reference's bitsandbytes NF4 uses 64-wide
    blocks, pipeline.py:30; GPTQ/AWQ use 128): one outlier no longer
    poisons a whole column. `in` must be divisible by 2*group; the
    even/odd nibble packing keeps each byte (rows 2i, 2i+1) inside one
    scale group."""
    k, n = w.shape
    assert k % (2 * group) == 0, (k, group)
    w = w.astype(jnp.float32)
    g = k // group
    wg = w.reshape(g, group, n)
    amax = jnp.max(jnp.abs(wg), axis=1)  # (G, N)
    gscale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(wg / gscale[:, None, :]), -7, 7)
    q = q.reshape(k, n).astype(jnp.int8)
    return {"w_q4": _pack_nibbles(q), "gscale": gscale}


def _group_of(q: dict) -> int:
    # group size is implied by the shapes (keeps the param dict all-array
    # so pytree maps/flattens stay uniform)
    return 2 * q["w_q4"].shape[0] // q["gscale"].shape[0]


def dequantize_weight_int4_grouped(q: dict, dtype=jnp.float32) -> jax.Array:
    vals = unpack_int4(q["w_q4"]).astype(dtype)  # (K, N)
    s = jnp.repeat(q["gscale"].astype(dtype), _group_of(q), axis=0)
    return vals * s


def unpack_int4(packed: jax.Array) -> jax.Array:
    """(in/2, out) packed → (in, out) int8-valued in [-7, 7] (int32
    carrier — Mosaic cannot shift i8 vectors). Inverse of
    `_pack_nibbles`: rows come back interleaved into original order.
    This is the XLA/interpret fallback; the TPU decode kernel
    reinterprets the same bytes with one `pltpu.bitcast` instead."""
    p32 = packed.astype(jnp.int32)
    lo = (p32 << 28) >> 28  # sign-extend low nibble  → rows 0,2,4,…
    hi = (p32 << 24) >> 28  # sign-extend high nibble → rows 1,3,5,…
    half, n = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * half, n)


def _nibble_planes(packed: jax.Array, dtype) -> tuple:
    """(K/2, N) packed → (lo, hi) sign-extended planes: lo[i] = orig
    row 2i, hi[i] = orig row 2i+1."""
    p32 = packed.astype(jnp.int32)
    lo = ((p32 << 28) >> 28).astype(dtype)
    hi = ((p32 << 24) >> 28).astype(dtype)
    return lo, hi


def int4_matmul(x: jax.Array, q: dict) -> jax.Array:
    """XLA (prefill / large-M) path. With the even/odd interleaved
    packing, x @ unpack(W) decomposes into two dots on the nibble
    planes with x's columns sliced even/odd — no row interleave of the
    (K, N) kernel ever materializes (a plain strided slice of the small
    activation replaces a full-weight relayout):
      x @ W = x[:, 0::2] @ lo + x[:, 1::2] @ hi."""
    lo, hi = _nibble_planes(q["w_q4"], x.dtype)
    if "gscale" in q:
        # byte row i (orig rows 2i, 2i+1) sits inside one scale group —
        # both planes share the per-(group/2 packed rows) scales
        s = jnp.repeat(q["gscale"].astype(x.dtype), _group_of(q) // 2, axis=0)
        return x[..., 0::2] @ (lo * s) + x[..., 1::2] @ (hi * s)
    y = x[..., 0::2] @ lo + x[..., 1::2] @ hi
    return y * q["scale"].astype(x.dtype)


_DEFAULT_PATTERN = re.compile(
    r"(layer_\d+\.(q|k|v|o|gate|up|down)|lm_head)$"
)


def quantize_tree(
    params,
    should_quantize: Optional[Callable[[str], bool]] = None,
    bits: int = 8,
    free_originals: bool = False,
    int4_grouped: bool = True,
    int8_paths: Optional[Callable[[str], bool]] = None,
    min_elems: int = 0,
):
    """Walk a param pytree, replacing matched linear subtrees
    ({"w": 2D, ...}) with their quantized form. `should_quantize`
    receives the dotted path of the linear's dict. `free_originals`
    deletes each source buffer as soon as its int8 copy exists, so a
    near-HBM-capacity model (7B bf16 on a 16 GB chip) can be quantized
    in place without holding both trees."""
    match = should_quantize or (lambda p: bool(_DEFAULT_PATTERN.search(p)))

    def qfn(w, path=""):
        if int8_paths is not None and int8_paths(path):
            return quantize_weight(w)
        return _qfn_bits(w)

    def _qfn_bits(w):
        # int4 only where the Pallas decode kernel can take it (even K
        # for nibble packing, lane-aligned N); odd shapes — e.g. the
        # 32009-wide vocab head — stay int8 so they never hit the slow
        # XLA shift-unpack path. Default: blockwise (group-128) scales
        # whenever K allows — the NF4/GPTQ-class quality scheme, matching
        # the reference's bnb-NF4 precision (pipeline.py:30) at ~905 ms
        # vs 724 ms for the lossier per-channel variant (BASELINE.md r2).
        if bits == 4 and w.shape[1] % 128 == 0:
            if int4_grouped and w.shape[0] % 256 == 0:
                return quantize_weight_int4_grouped(w)
            if w.shape[0] % 2 == 0:
                return quantize_weight_int4(w)
        return quantize_weight(w)

    def walk(node, path):
        if isinstance(node, dict):
            if (
                "w" in node
                and getattr(node["w"], "ndim", 0) == 2
                and node["w"].size >= min_elems
                and match(path)
            ):
                q = qfn(node["w"], path)
                if free_originals:
                    # host readback = hard completion barrier (remote
                    # backends ack block_until_ready before execution
                    # finishes, and deep unsynced dispatch chains exhaust
                    # the relay queue)
                    qk = "w_q" if "w_q" in q else "w_q4"
                    float(jnp.sum(q[qk].astype(jnp.int32)))
                    float(jnp.sum(q.get("scale", q.get("gscale"))))
                    try:
                        node["w"].delete()
                    except Exception:
                        pass
                rest = {k: v for k, v in node.items() if k != "w"}
                return {**q, **rest}
            return {k: walk(v, f"{path}.{k}" if path else k) for k, v in node.items()}
        return node

    return walk(params, "")


# Every linear param-dict name in the framework's models (UNet, CLIP
# text/vision, GPT-2, ImageBind ViTs, prior projections, IP-Adapter) —
# embeddings (token/position tables, sos/eos rows, wpe) deliberately
# absent so a generic walk never quantizes a lookup table.
_LINEAR_NAMES = re.compile(
    r"(^|\.)("
    r"to_(q|k|v|kv|qkv|out|k_ip|v_ip)|ff_(in|out)|ff[12]|fc[12]|"
    r"attn_(qkv|out)|out_proj|output_proj|head_proj|text_projection|"
    r"visual_projection|proj(_in|_out|_[a-z_0-9]+)?|time_emb|wqkv|qkv|"
    r"lm_head|[qkvo]|gate|up|down|(up|down)_proj"
    r")$"
)


def quantize_linears(params, bits: int = 8, min_elems: int = 1 << 20,
                     free_originals: bool = False):
    """Weight-only quantization of every *linear* in an arbitrary model
    tree (UNet/refiner/CLIP/ImageBind/prior) — the single-chip resident
    mode's memory lever: int8 UNet linears measured −2.7% step time vs
    bf16 (BASELINE.md r2), and int8+int4 residency eliminates per-edit
    weight staging entirely (VERDICT r4 item 2). Conv kernels, norms and
    embedding tables stay bf16 (convs carry most of a VAE; tables are
    gathers). `min_elems` skips small linears where the scale rows cost
    more than the bytes saved."""
    return quantize_tree(
        params,
        should_quantize=lambda p: bool(_LINEAR_NAMES.search(p)),
        bits=bits,
        min_elems=min_elems,
        free_originals=free_originals,
    )


def quantize_llama(params, bits: int = 8, free_originals: bool = False,
                   int4_grouped: bool = True, tp_rows_int8: bool = False):
    """Quantize every decoder linear (q/k/v/o/gate/up/down + lm_head);
    embeddings and norms stay bf16 (lookup tables and tiny vectors).
    `int4_grouped=False` trades NF4-class blockwise scales for the
    faster per-channel int4 decode kernel. `tp_rows_int8` keeps the
    row-parallel layers (o/down) at int8 so a tensor-parallel decode
    can shard their contraction dim (int4's half-split nibble packing
    cannot be row-sharded contiguously — parallel/sharding.py
    LLAMA_TP_RULES)."""
    rows = re.compile(r"layer_\d+\.(o|down)$")
    return quantize_tree(
        params, bits=bits, free_originals=free_originals,
        int4_grouped=int4_grouped,
        int8_paths=(lambda p: bool(rows.search(p))) if tp_rows_int8 else None,
    )


# ------------------------------------------------- Pallas decode kernel


def _qmv_kernel(*refs, bits: int, grouped: bool = False,
                interpret: bool = False, variant: str = "chain",
                norm_eps: float = 0.0, has_norm: bool = False,
                swiglu: bool = False, has_residual: bool = False):
    """One output tile of x @ dequant(W): x (M, K) resident, W block
    (K, bn) int8 (or (K/2, bn) packed int4) dequantized in VMEM — the
    bf16 kernel never exists in HBM, so decode reads bits/8 bytes per
    weight instead of 2 (the reference's raison d'être for bnb-4bit,
    pipeline.py:30). Dequant lands in the activation dtype — for the
    production bf16 path that's exact for int8/int4 magnitudes (≤255
    fits bf16's 8-bit mantissa) and halves the VMEM footprint of the
    unpacked tile vs f32. int4 on TPU reinterprets the packed bytes
    with `pltpu.bitcast(…, int4)` — thanks to the even/odd nibble
    packing (`_pack_nibbles`) the rows land in original order, so the
    whole unpack is one native int4→float convert (the r2/r3 shift+
    mask+concat chain was the VPU work that kept decode off the HBM
    floor); interpret mode (CPU tests) keeps the shift-unpack.

    Glue fusion (r4, decode-attribution payoff — BASELINE.md r4
    decode-step row: 0.696 ms/step of XLA glue between the kernels):
      has_norm     RMSNorm prologue — normalize x rows in f32, scale by
                   the g vector, round-trip through the activation dtype
                   (bit-parity with `layers.rms_norm` → matvec)
      swiglu       x arrives as the gate_up pair (M, 2K); the effective
                   activation silu(x[:, :K]) * x[:, K:] is built in VMEM
                   (the down-proj's input never exists in HBM)
      has_residual residual epilogue — add the blocked residual AFTER
                   casting the accumulator to the output dtype
                   (bit-parity with the unfused bf16 `x + delta`)
    The prologue work repeats per grid step (a few K elements of VPU
    math under a multi-MB weight DMA) — measured free."""
    refs = list(refs)
    x_ref = refs.pop(0)
    w_ref = refs.pop(0)
    s_ref = refs.pop(0)
    g_ref = refs.pop(0) if has_norm else None
    r_ref = refs.pop(0) if has_residual else None
    (o_ref,) = refs
    w = w_ref[:]
    if bits == 4:
        if interpret:
            w = unpack_int4(w)
        else:
            from jax.experimental.pallas import tpu as pltpu

            w = pltpu.bitcast(w, jnp.int4)  # (K, bn), original row order
    x = x_ref[:]
    act_dtype = x.dtype
    if has_norm:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * jax.lax.rsqrt(var + norm_eps) * g_ref[:].astype(jnp.float32)
        x = xn.astype(act_dtype)
    if swiglu:
        kk = x.shape[-1] // 2
        g_half, u_half = x[:, :kk], x[:, kk:]
        x = (jax.nn.silu(g_half.astype(jnp.float32)).astype(act_dtype)
             * u_half)
    if bits == 4 and x.dtype != jnp.float32:
        # f32 activations are faster for the int4 kernel (see
        # pallas_qmatmul); plain calls cast at the host boundary, fused
        # calls keep the original dtype through the prologue for parity
        # with the unfused op order and cast here
        x = x.astype(jnp.float32)

    def _store(acc):
        y = acc.astype(o_ref.dtype)
        if has_residual:
            y = y + r_ref[:].astype(o_ref.dtype)
        o_ref[:] = y

    if grouped:
        # blockwise scales (G, bn): one partial dot per scale group,
        # scaled into the f32 accumulator. Beats scaling the whole
        # dequantized tile (VPU: G·bn multiplies instead of K·bn) —
        # 77 vs 88 µs at 7B shapes (BASELINE.md r2)
        g_count = s_ref.shape[0]
        group = w.shape[0] // g_count
        wd = w.astype(x.dtype)
        if variant == "tile":
            # A/B variant (IA2P_QMV_GROUPED=tile): scale the dequantized
            # tile blockwise in VMEM — a (G, group, bn) broadcast multiply
            # (pure outer-dim reshape, no relayout) — then ONE full-K dot
            # instead of the G-deep chained partial-dot accumulation.
            # VMEM: this materializes a SECOND full (K, bn) tile (ws)
            # alongside wd, roughly doubling the peak unpacked footprint —
            # pallas_qmatmul halves block_n for this variant so it
            # compiles at the same shapes the chain path handles.
            ws = wd.reshape(g_count, group, wd.shape[1]) * s_ref[:][:, None, :].astype(x.dtype)
            acc = jnp.dot(
                x, ws.reshape(w.shape[0], -1), preferred_element_type=jnp.float32
            )
            _store(acc)
            return
        if variant == "batched":
            # A/B variant (IA2P_QMV_GROUPED=batched): ONE G-batched
            # dot_general replaces the G-deep sequential partial-dot
            # chain (the chain's per-dot issue latency is the suspected
            # M=1 tax, PERF.md §2), then a (G, M, bn) × (G, 1, bn)
            # weighted reduce lands the blockwise scales.
            x3 = x.reshape(x.shape[0], g_count, group).transpose(1, 0, 2)
            part = jax.lax.dot_general(
                x3, wd.reshape(g_count, group, wd.shape[1]),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, M, bn)
            acc = jnp.sum(part * s_ref[:][:, None, :].astype(jnp.float32), axis=0)
            _store(acc)
            return
        acc = jnp.zeros((x.shape[0], o_ref.shape[1]), jnp.float32)
        for g in range(g_count):
            part = jnp.dot(
                x[:, g * group:(g + 1) * group],
                wd[g * group:(g + 1) * group],
                preferred_element_type=jnp.float32,
            )
            acc = acc + part * s_ref[g][None]
        _store(acc)
    else:
        acc = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        _store(acc * s_ref[0][None].astype(jnp.float32))


def _qmv_stream_kernel(*refs, bits: int, grouped: bool, nbuf: int, bn: int,
                       norm_eps: float = 0.0, has_norm: bool = False,
                       swiglu: bool = False, has_residual: bool = False):
    """Streaming variant of `_qmv_kernel`: grid=() with the weight in
    ANY/HBM space and a manual nbuf-slot async-copy rotation keeping
    nbuf-1 copies in flight (the grid pipeline's single outstanding DMA
    leaves HBM under-subscribed — header note). The math per output
    column is identical to the grid kernel (same group-dot order), so
    outputs are bit-exact across the two paths; the norm/swiglu
    prologue additionally runs ONCE instead of once per grid step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    refs = list(refs)
    x_ref = refs.pop(0)
    w_hbm = refs.pop(0)
    s_ref = refs.pop(0)
    g_ref = refs.pop(0) if has_norm else None
    r_ref = refs.pop(0) if has_residual else None
    (o_ref,) = refs
    kp, n = w_hbm.shape
    nblk = n // bn

    x = x_ref[:]
    act_dtype = x.dtype
    if has_norm:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * jax.lax.rsqrt(var + norm_eps) * g_ref[:].astype(jnp.float32)
        x = xn.astype(act_dtype)
    if swiglu:
        kk = x.shape[-1] // 2
        g_half, u_half = x[:, :kk], x[:, kk:]
        x = (jax.nn.silu(g_half.astype(jnp.float32)).astype(act_dtype)
             * u_half)
    if bits == 4 and x.dtype != jnp.float32:
        x = x.astype(jnp.float32)

    def body(scratch, sems):
        def copy(i, slot):
            return pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(i * bn, bn)], scratch.at[slot],
                sems.at[slot],
            )

        for w in range(min(nbuf - 1, nblk)):
            copy(w, w).start()

        def loop(i, _):
            slot = jax.lax.rem(i, nbuf)

            @pl.when(i + nbuf - 1 < nblk)
            def _():
                copy(i + nbuf - 1, jax.lax.rem(i + nbuf - 1, nbuf)).start()

            copy(i, slot).wait()
            w = scratch[slot]
            if bits == 4:
                w = pltpu.bitcast(w, jnp.int4)  # (K, bn), original order
            wd = w.astype(x.dtype)
            sblk = s_ref[:, pl.ds(i * bn, bn)]  # (G, bn) or (1, bn)
            if grouped:
                g_count = s_ref.shape[0]
                group = wd.shape[0] // g_count
                acc = jnp.zeros((x.shape[0], bn), jnp.float32)
                for g in range(g_count):
                    part = jnp.dot(
                        x[:, g * group:(g + 1) * group],
                        wd[g * group:(g + 1) * group],
                        preferred_element_type=jnp.float32,
                    )
                    acc = acc + part * sblk[g][None]
            else:
                acc = jnp.dot(x, wd, preferred_element_type=jnp.float32)
                acc = acc * sblk[0][None].astype(jnp.float32)
            y = acc.astype(o_ref.dtype)
            if has_residual:
                y = y + r_ref[:, pl.ds(i * bn, bn)].astype(o_ref.dtype)
            o_ref[:, pl.ds(i * bn, bn)] = y
            return _

        jax.lax.fori_loop(0, nblk, loop, None)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((nbuf, kp, bn), jnp.int8),
        sems=pltpu.SemaphoreType.DMA((nbuf,)),
    )


def pallas_qmatmul(
    x: jax.Array, q: dict, block_n: int = 1024, interpret: Optional[bool] = None,
    norm_g: Optional[jax.Array] = None, norm_eps: float = 1e-6,
    swiglu: bool = False, residual: Optional[jax.Array] = None,
) -> jax.Array:
    """Small-M (decode) quantized matmul via Pallas. x: (..., K);
    q: {"w_q": (K, N) int8} or {"w_q4": (K/2, N) int8}, with "scale"
    (N,) per-channel or "gscale" (K/group, N) blockwise (int4 only).

    Optional decode-glue fusion (see `_qmv_kernel`): `norm_g` folds an
    RMSNorm over x into the kernel prologue; `swiglu` treats x as the
    concatenated (…, 2K) gate_up pair and builds silu(gate)·up in VMEM;
    `residual` (…, N) is added to the output in the epilogue.

    Block-width tuning (r3, v5e, 4096×11008 matvec in-loop): per-grid-
    step overhead is ≈0.3 µs, so wider N blocks win — 93.8 µs at
    BN=128, 78.0 at 256, 71.7 at 512, 68.7 at 1024. The VMEM cap
    therefore bounds the PACKED bytes streamed per block (k·bn·bits/8),
    not k·bn: int4's half-size packing earns it 2× the block width. At
    the llama `down` shape (K=11008, int4) this moves BN 128→512:
    101.9 µs (an A/B'd two-way K-split at wide BN) vs 70.2 µs no-split
    per-channel / 80.0 µs grouped; BN=1024 is flat for per-channel
    (71.1) and fails to compile for grouped at K=11008 — 512 is the
    cap's landing point there, 1024 at K=4096 (measured 68.7)."""
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    bits = 4 if "w_q4" in q else 8
    grouped = "gscale" in q
    w = q["w_q4"] if bits == 4 else q["w_q"]
    n = w.shape[1]
    lead = x.shape[:-1]
    xk = x.shape[-1]           # width of the activation operand
    k = (2 * w.shape[0]) if bits == 4 else w.shape[0]  # contraction dim
    assert xk == (2 * k if swiglu else k), (xk, k, swiglu)
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, xk)
    fused_prologue = (norm_g is not None) or swiglu
    if bits == 4 and not fused_prologue:
        # f32 activations make the int4 kernel faster, not slower (r3
        # A/B, weights-as-args + host-readback sync): the i32→f32
        # dequant convert is a single VPU op where i32→bf16 round-trips
        # through f32, and the grouped per-partial-dot scaling stays in
        # f32 end-to-end. Grouped at the four 7B decode shapes:
        # 83.6/48.6/127.5/79.1 µs bf16-x → 69.3/43.2/111.0/68.0 f32-x
        # (−14 %, closing to within 2 % of per-channel); per-channel
        # −1 %. M≤16 rows keep the extra x bytes negligible.
        # Fused prologues keep the original dtype through the in-kernel
        # norm/silu (op-order parity with the unfused path) and cast in
        # the kernel instead.
        x2 = x2.astype(jnp.float32)

    variant = _QMV_GROUPED_VARIANT
    while n % block_n:
        block_n //= 2
    # VMEM budget: the double-buffered PACKED weight block plus the
    # dequantized tile must stay under the 16 MB scoped limit. Bound
    # the packed bytes (k·bn·bits/8 ≤ 4.2 MB): int8 caps at the
    # measured-best 4096×1024 config; int4's half-size rows allow 2×
    # wider blocks (11008×512 / 4096×1024) — see the docstring A/B.
    # The tile variant keeps TWO unpacked (K, bn) tiles live
    # (wd + ws), so it gets half the width.
    packed_budget = 2.1e6 if (grouped and variant == "tile") else 4.2e6
    while block_n > 128 and k * block_n * bits / 8 > packed_budget:
        block_n //= 2
    if grouped:
        scales = q["gscale"].astype(jnp.float32)  # (G, N)
    else:
        # scale as (1, N): 1-D operands hit XLA/Mosaic tiling-layout
        # mismatches (T(1024) vs T(bn))
        scales = q["scale"].reshape(1, -1).astype(jnp.float32)

    # -------- streaming multi-buffer path (default on hardware): up to
    # nbuf-1 weight-block copies in flight instead of the grid
    # pipeline's one — measured −2..−27 % per 7B matvec (header note).
    # Narrower blocks win here (more outstanding copies); VMEM holds
    # nbuf packed blocks + scales + x + out.
    if (
        not interpret
        and _QMV_PIPE == "stream"
        and (not grouped or _QMV_GROUPED_VARIANT == "chain")
    ):
        # narrow outputs stream best with narrower blocks (more copies
        # in flight over the same bytes): o/down at 7B (N=4096) measured
        # 13.9→12.8 / 36.1→34.9 µs at bn 256→128 (r5 sweep); wide
        # outputs (qkv 12288 / gate_up 22016) stay at the default.
        nbuf, bn = _QMV_NBUF, (128 if n <= 4096 else _QMV_STREAM_BN)
        while bn > 64 and n % bn:
            bn //= 2
        kp = w.shape[0]
        while bn > 128 and nbuf * kp * bn > 6e6:
            bn //= 2
        while nbuf > 2 and nbuf * kp * bn > 6e6:
            nbuf -= 1
        if bn >= 128 and n % bn == 0:
            operands = [x2, w, scales]
            in_specs = [
                pl.BlockSpec((m, xk), lambda: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((scales.shape[0], n), lambda: (0, 0)),
            ]
            if norm_g is not None:
                operands.append(norm_g.reshape(1, xk).astype(jnp.float32))
                in_specs.append(pl.BlockSpec((1, xk), lambda: (0, 0)))
            if residual is not None:
                operands.append(residual.reshape(m, n))
                in_specs.append(pl.BlockSpec((m, n), lambda: (0, 0)))
            out = pl.pallas_call(
                __import__("functools").partial(
                    _qmv_stream_kernel, bits=bits, grouped=grouped,
                    nbuf=nbuf, bn=bn, norm_eps=norm_eps,
                    has_norm=norm_g is not None, swiglu=swiglu,
                    has_residual=residual is not None,
                ),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((m, n), lambda: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
            )(*operands)
            return out.reshape(*lead, n)

    operands = [x2, w, scales]
    in_specs = [
        pl.BlockSpec((m, xk), lambda i: (0, 0)),
        pl.BlockSpec((w.shape[0], block_n), lambda i: (0, i)),
        pl.BlockSpec((scales.shape[0], block_n), lambda i: (0, i)),
    ]
    if norm_g is not None:
        operands.append(norm_g.reshape(1, xk).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, xk), lambda i: (0, 0)))
    if residual is not None:
        operands.append(residual.reshape(m, n))
        in_specs.append(pl.BlockSpec((m, block_n), lambda i: (0, i)))
    out = pl.pallas_call(
        __import__("functools").partial(
            _qmv_kernel, bits=bits, grouped=grouped, interpret=interpret,
            variant=variant, norm_eps=norm_eps,
            has_norm=norm_g is not None, swiglu=swiglu,
            has_residual=residual is not None,
        ),
        grid=(n // block_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, block_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(*lead, n)
