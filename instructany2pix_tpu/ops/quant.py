"""Weight-only quantization for bandwidth-bound decode.

The reference squeezes its 7B LLM onto one GPU with bitsandbytes NF4
(reference pipeline.py:30 `load_in_4bit=True`). On TPU the equivalent
win is bandwidth, not capacity: KV-cached decode reads every weight once
per token, so int8 weights halve the HBM traffic and roughly halve
decode latency on a v5e (int4 packed halves it again). Layout:

  {"w": (in, out) fp}  →  {"w_q": (in, out) int8, "scale": (out,) f32}

Per-output-channel symmetric absmax scales. `models.layers.linear`
dispatches on the presence of "w_q" — any linear in any model can be
quantized without touching forward code. XLA fuses the int8→bf16
convert into the dot's operand read, so the bf16 kernel never
materializes in HBM (verified by decode-latency A/B in BASELINE.md).

int4 uses the same contract with two nibbles packed per int8 byte
("w_q4", (in/2, out)); unpacking is two shifts + a concat that XLA
fuses likewise.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> dict:
    """(in, out) float weights → int8 + per-out-channel scale."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)  # (out,)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale}


def dequantize_weight(q: dict, dtype=jnp.float32) -> jax.Array:
    return q["w_q"].astype(dtype) * q["scale"].astype(dtype)[None, :]


def quantize_weight_int4(w: jax.Array) -> dict:
    """(in, out) → packed int4 (two rows per byte) + scale. `in` must be
    even."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[None, :]), -7, 7).astype(jnp.int8)
    lo = q[0::2] & 0x0F  # even input rows → low nibble
    hi = (q[1::2] & 0x0F) << 4
    return {"w_q4": (lo | hi).astype(jnp.int8), "scale": scale}


def unpack_int4(packed: jax.Array) -> jax.Array:
    """(in/2, out) packed → (in, out) int8 in [-7, 7]."""
    lo = (packed << 4) >> 4  # sign-extend low nibble (arithmetic shift)
    hi = packed >> 4
    half, out = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(half * 2, out)


def int4_matmul(x: jax.Array, q: dict) -> jax.Array:
    w = unpack_int4(q["w_q4"]).astype(x.dtype)
    return (x @ w) * q["scale"].astype(x.dtype)


_DEFAULT_PATTERN = re.compile(
    r"(layer_\d+\.(q|k|v|o|gate|up|down)|lm_head)$"
)


def quantize_tree(
    params,
    should_quantize: Optional[Callable[[str], bool]] = None,
    bits: int = 8,
    free_originals: bool = False,
):
    """Walk a param pytree, replacing matched linear subtrees
    ({"w": 2D, ...}) with their quantized form. `should_quantize`
    receives the dotted path of the linear's dict. `free_originals`
    deletes each source buffer as soon as its int8 copy exists, so a
    near-HBM-capacity model (7B bf16 on a 16 GB chip) can be quantized
    in place without holding both trees."""
    match = should_quantize or (lambda p: bool(_DEFAULT_PATTERN.search(p)))
    qfn = quantize_weight if bits == 8 else quantize_weight_int4

    def walk(node, path):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2 and match(path):
                q = qfn(node["w"])
                if free_originals:
                    # host readback = hard completion barrier (remote
                    # backends ack block_until_ready before execution
                    # finishes, and deep unsynced dispatch chains exhaust
                    # the relay queue)
                    qk = "w_q" if "w_q" in q else "w_q4"
                    float(jnp.sum(q[qk].astype(jnp.int32)))
                    float(jnp.sum(q["scale"]))
                    try:
                        node["w"].delete()
                    except Exception:
                        pass
                rest = {k: v for k, v in node.items() if k != "w"}
                return {**q, **rest}
            return {k: walk(v, f"{path}.{k}" if path else k) for k, v in node.items()}
        return node

    return walk(params, "")


def quantize_llama(params, bits: int = 8, free_originals: bool = False):
    """Quantize every decoder linear (q/k/v/o/gate/up/down + lm_head);
    embeddings and norms stay bf16 (lookup tables and tiny vectors)."""
    return quantize_tree(params, bits=bits, free_originals=free_originals)
