"""Shared pure-functional NN building blocks.

Every model in the framework is a pair of functions over nested-dict
param pytrees: `init(key, cfg) -> params` and `apply(params, ...)`.
These primitives keep that style uniform: weights stored so the apply
path is `x @ w + b` (input-major), convs NHWC/HWIO (TPU-native
layouts — torch NCHW/OIHW checkpoints are transposed on import by
core.checkpoint converters).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from ..ops.groupnorm import group_norm as fused_group_norm


# ---------------------------------------------------------------- linear


def linear_init(key, in_dim, out_dim, bias=True, scale=None, dtype=jnp.float32):
    scale = scale if scale is not None else in_dim**-0.5
    p = {"w": jax.random.normal(key, (in_dim, out_dim), dtype) * scale}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def _use_pallas_qmv(p, x) -> bool:
    # bandwidth-bound decode shapes (tiny M): the Pallas kernel's
    # in-VMEM dequant beats the XLA fused-convert path (int8 85 vs
    # 121 µs, int4 60-66 µs on 7B shapes — BASELINE.md r2); prefill
    # (large M) is compute-bound and stays on the XLA/MXU path, as do
    # lane-unaligned output dims (e.g. a 32009-wide vocab head).
    # IA2P_QMV=off forces the XLA path — needed when quantized decode
    # weights are GSPMD-sharded (pallas_call can't partition them).
    import math
    import os

    if os.environ.get("IA2P_QMV") == "off":
        return False
    w = p["w_q"] if "w_q" in p else p["w_q4"]
    # GSPMD-sharded weights (TP decode) can't be partitioned by
    # pallas_call — route them to the XLA path automatically instead of
    # relying on the env var.
    try:  # tracers may not expose .sharding — treat as unsharded
        shd = w.sharding if isinstance(w, jax.Array) else None
    except Exception:  # noqa: BLE001
        shd = None
    if shd is not None and not getattr(shd, "is_fully_replicated", True):
        return False
    m = math.prod(x.shape[:-1]) if x.ndim > 1 else 1
    return m <= 16 and w.shape[1] % 128 == 0 and jax.default_backend() == "tpu"


def linear(p, x, compute_dtype=None, norm=None, swiglu=False, residual=None):
    """`norm=(g, eps)`, `swiglu`, `residual` fuse decode glue into the
    Pallas qmv kernel when that path is taken (ops/quant.py — RMSNorm
    prologue, silu(gate)·up pairing, residual epilogue); every other
    path composes the same ops explicitly, so callers can pass them
    unconditionally (prefill/CPU/float weights keep identical
    semantics)."""
    fused = norm is not None or swiglu or residual is not None
    if "w_q" in p or "w_q4" in p:
        # weight-only quantization (ops/quant.py): the int8/int4 kernel
        # is read from HBM and dequantized in-registers/VMEM, so decode
        # reads 1 or 0.5 bytes per weight instead of 2 — the TPU
        # counterpart of the reference's bitsandbytes 4-bit LLM
        # (reference pipeline.py:30). Per-output-channel scales.
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        # LoRA factors must see the transformed activation, which the
        # kernel keeps in VMEM — compose the prologue on the host path
        # instead of fusing when adapters are attached
        if fused and _use_pallas_qmv(p, x) and "lora_a" not in p:
            from ..ops.quant import pallas_qmatmul

            return pallas_qmatmul(
                x, p,
                norm_g=norm[0] if norm is not None else None,
                norm_eps=norm[1] if norm is not None else 1e-6,
                swiglu=swiglu, residual=residual,
            ) + (p["b"].astype(x.dtype) if "b" in p else 0)
        if fused:
            x = _fused_prologue(x, norm, swiglu)
            y = linear(p, x)
            return y + residual if residual is not None else y
        if _use_pallas_qmv(p, x):
            from ..ops.quant import pallas_qmatmul

            y = pallas_qmatmul(x, p)
        elif "w_q" in p:
            y = (x @ p["w_q"].astype(x.dtype)) * p["scale"].astype(x.dtype)
        else:
            from ..ops.quant import int4_matmul

            y = int4_matmul(x, p)
        if "lora_a" in p:
            # adapters survive quantization of the base weight
            # (quantize_tree keeps non-"w" leaves): apply them here too
            scale = p.get("lora_scale", jnp.ones((), y.dtype))
            y = y + ((x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)) * scale
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y
    if fused:
        x = _fused_prologue(x, norm, swiglu)
        y = linear(p, x, compute_dtype=compute_dtype)
        return y + residual if residual is not None else y
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = x @ w
    if "lora_a" in p:
        # low-rank adapter: y += (x @ A) @ B · (alpha/r) — the PEFT/LoRA
        # path of reference train.py:814-831, fused into the primitive
        # so any linear in any model is adaptable
        scale = p.get("lora_scale", jnp.ones((), y.dtype))
        y = y + ((x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)) * scale
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _fused_prologue(x, norm, swiglu):
    """Composed (non-kernel) form of the linear-fusion prologue — the
    op order mirrors `ops.quant._qmv_kernel` so both paths agree."""
    if norm is not None:
        x = rms_norm({"g": norm[0]}, x, norm[1])
    if swiglu:
        k = x.shape[-1] // 2
        x = silu(x[..., :k]) * x[..., k:]
    return x


def add_lora(p, key, rank: int = 8, alpha: float = 16.0):
    """Attach zero-initialized LoRA factors to a linear's param dict."""
    in_dim, out_dim = p["w"].shape
    return {
        **p,
        "lora_a": jax.random.normal(key, (in_dim, rank), p["w"].dtype) * (1.0 / in_dim**0.5),
        "lora_b": jnp.zeros((rank, out_dim), p["w"].dtype),
        "lora_scale": jnp.asarray(alpha / rank, p["w"].dtype),
    }


# ----------------------------------------------------------------- norms


def layer_norm_init(dim, dtype=jnp.float32):
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm_init(dim, dtype=jnp.float32):
    return {"g": jnp.ones((dim,), dtype)}


def rms_norm(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32)).astype(x.dtype)


def group_norm_init(dim, dtype=jnp.float32):
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def group_norm(p, x, num_groups=32, eps=1e-5, silu=False):
    return fused_group_norm(x, p["g"], p["b"], num_groups, eps, silu)


# ------------------------------------------------------------------ conv


def conv_init(key, in_ch, out_ch, kernel=3, bias=True, dtype=jnp.float32):
    scale = (in_ch * kernel * kernel) ** -0.5
    p = {"w": jax.random.normal(key, (kernel, kernel, in_ch, out_ch), dtype) * scale}
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype)
    return p


def upsample2x_nearest(x):
    """2× nearest upsample as broadcast+reshape — a pure relayout, no
    gather (measured faster than jax.image.resize "nearest" on v5e:
    156 vs 184 µs at (2,32,32,640), BASELINE.md r2)."""
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return y.reshape(b, h * 2, w * 2, c)


def conv2d(p, x, stride=1, padding="SAME"):
    """NHWC conv; weight HWIO."""
    w = p["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ----------------------------------------------------------- embeddings


def embedding_init(key, vocab, dim, dtype=jnp.float32):
    return {"w": jax.random.normal(key, (vocab, dim), dtype) * 0.02}


def embedding(p, ids):
    # mode="clip": out-of-range ids clamp instead of jnp.take's default
    # NaN fill — an OOB id is a caller bug, but NaN poisons everything
    # downstream silently (cost us two debugging rounds), while clamping
    # keeps outputs finite and assertions closer to the source.
    return jnp.take(p["w"], ids, axis=0, mode="clip")


def timestep_embedding(
    t: jax.Array,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
) -> jax.Array:
    """Sinusoidal timestep embedding, diffusers get_timestep_embedding
    semantics (used by the UNet time embed and the prior's noise-level /
    score embeddings, reference prior/model.py:565-568,613-615)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = t.astype(jnp.float32)[..., None] * freqs
    args = args * scale
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[..., half:], emb[..., :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


# -------------------------------------------------------------- helpers


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def silu(x):
    return jax.nn.silu(x)


def mlp_init(key, dim, hidden, out=None, bias=True, dtype=jnp.float32):
    out = out or dim
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, dim, hidden, bias, dtype=dtype),
        "fc2": linear_init(k2, hidden, out, bias, dtype=dtype),
    }
