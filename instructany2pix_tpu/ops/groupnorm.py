"""Fused GroupNorm(+SiLU) — Pallas kernel with XLA fallback.

Every SDXL ResNet block runs GroupNorm→SiLU→Conv (the reference relies
on torch's cuDNN for this; diffusers ResnetBlock2D). On TPU the conv
lands on the MXU via XLA; the GroupNorm+SiLU prologue is
bandwidth-bound, so fusing the normalization statistics, affine, and
activation into one VMEM pass saves two HBM round-trips.

Layout: NHWC. The kernel grids over (batch, group); each program
normalizes one (H*W, C/G) tile in fp32 and applies SiLU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gn_silu_kernel(x_ref, g_ref, b_ref, o_ref, *, eps, silu):
    x = x_ref[:].astype(jnp.float32)  # (1, HW, CG)
    mean = jnp.mean(x)
    var = jnp.mean(jnp.square(x - mean))
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv
    y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[:] = y.astype(o_ref.dtype)


def _group_norm_xla(x, gamma, beta, num_groups, eps, silu):
    # x: (B, H, W, C) or (B, L, C)
    orig_shape = x.shape
    c = orig_shape[-1]
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(orig_shape[0], -1, num_groups, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(orig_shape[0], -1, c)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.reshape(orig_shape).astype(x.dtype)


def group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """GroupNorm over the channel-last axis, optionally fused with SiLU."""
    from .attention import _tpu_available

    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    cg = c // num_groups
    b = x.shape[0]
    hw = 1
    for s in x.shape[1:-1]:
        hw *= s

    # Measured on v5e: XLA's own GroupNorm+SiLU fusion currently beats this
    # kernel (0.84 ms vs 1.32 ms at 2x64x64x640), so "auto" routes to XLA;
    # the Pallas path stays available behind impl="pallas" for further tuning.
    use_pallas = impl == "pallas" and hw % 8 == 0 and cg >= 8
    if not use_pallas:
        return _group_norm_xla(x, gamma, beta, num_groups, eps, silu)

    xr = x.reshape(b, hw, num_groups, cg).swapaxes(1, 2).reshape(b * num_groups, hw, cg)
    gr = gamma.reshape(num_groups, 1, cg)
    br = beta.reshape(num_groups, 1, cg)
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, eps=eps, silu=silu),
        grid=(b * num_groups,),
        in_specs=[
            pl.BlockSpec((1, hw, cg), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, cg), lambda i: (i % num_groups, 0, 0)),
            pl.BlockSpec((1, 1, cg), lambda i: (i % num_groups, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hw, cg), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
    )(xr, gr, br)
    return out.reshape(b, num_groups, hw, cg).swapaxes(1, 2).reshape(x.shape)
