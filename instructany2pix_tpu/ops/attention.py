"""Attention dispatch: Pallas flash kernel on TPU, XLA math elsewhere.

One entry point for every attention in the framework (Llama decoder,
GPT-2 prior, SDXL UNet self/cross, CLIP, ImageBind ViTs). The
reference swaps per-layer "attention processors" at runtime (reference
diffusion/ip_adapter/ip_adapter.py:120-148); here conditioning variants
(IP-Adapter extra K/V) are expressed by the caller concatenating KV
sources — the kernel itself stays uniform.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .flash_attention import _reference_attention, flash_attention


def _tpu_available() -> bool:
    # Deliberately NOT lru_cached: the backend can change mid-process
    # (dryrun_multichip re-inits a virtual CPU mesh after entry() ran on
    # the real chip) and a stale True routes 256-token attention to the
    # Pallas kernel on CPU, which only supports interpret mode.
    # jax.default_backend() is itself memoized per-backend, so this is
    # cheap at trace time.
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Attention over (B, S, H, D) tensors (sequence-major, like
    jax.nn.dot_product_attention). Returns (B, S, H, D).

    impl: "auto" | "flash" | "xla".  "auto" uses the Pallas kernel on
    TPU for long sequences with no arbitrary mask; otherwise XLA.
    The IA2P_ATTN_IMPL env var overrides "auto" (benchmark A/B knob).
    """
    if impl == "auto":
        import os

        impl = os.environ.get("IA2P_ATTN_IMPL", "auto")
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale if scale is not None else d**-0.5

    # Grouped-query support: broadcast kv heads.
    if k.shape[2] != h:
        rep = h // k.shape[2]
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    # Measured on v5e at d=64 (r3, roundtrip-corrected; BASELINE.md):
    # flash runs ~57-64 TF/s at every seq ≥ 1024, while XLA's fused
    # softmax is bimodal in the attention-matrix footprint b·h·sq·sk —
    # under ~32M elements it stays fused and FAST (e.g. (2,10,1024,64):
    # 77 vs 82 µs, XLA wins), above it the f32 S matrix spills and XLA
    # collapses ((2,20,1024,64): 493 vs 188 µs; (1,10,4096,64): 4798 vs
    # 724 µs). Gate mid-size seqs on the footprint; keep the r2-measured
    # 256-511 window and the unconditional ≥2048 regime.
    footprint = b * h * sq * sk
    use_flash = impl == "flash" or (
        impl == "auto"
        and _tpu_available()
        and mask is None
        and d <= 256
        and (
            (256 <= sk < 512 and sq >= 256)
            or (sq >= 2048 and sk >= 2048)
            or (sq >= 1024 and sk >= 1024 and footprint >= (32 << 20))
        )
    )
    if use_flash:
        qt = jnp.swapaxes(q, 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        o = flash_attention(qt, kt, vt, causal, scale)
        return jnp.swapaxes(o, 1, 2)

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if mask is None:
        o = _reference_attention(qt, kt, vt, causal, scale)
    else:
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qt.astype(jnp.float32), kt.astype(jnp.float32)
        ) * scale
        if mask.ndim == 2:  # (B, Sk) key padding mask
            mask = mask[:, None, None, :]
        elif mask.ndim == 3:  # (B, Sq, Sk)
            mask = mask[:, None, :, :]
        s = jnp.where(mask, s, -1e30)
        if causal:
            cm = jnp.tril(jnp.ones((sq, sk), bool), k=sk - sq)
            s = jnp.where(cm, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vt.dtype), vt)
    return jnp.swapaxes(o, 1, 2).astype(q.dtype)
