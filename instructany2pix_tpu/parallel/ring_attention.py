"""Ring attention — sequence-parallel exact attention over a mesh axis.

The reference has no distributed sequence parallelism (SURVEY.md §5.7:
the only thing named "SEQUENCE_PARALLEL" is an intra-kernel tiling
constant in the dead Triton kernel). For 2048-token sequences the
Pallas flash kernel suffices on one chip; this module provides the
*scaling* path for longer contexts: K/V blocks rotate around the mesh
axis via `ppermute` while each device online-softmax-accumulates its
local queries — exact attention with O(S/n) memory per device and
compute/communication overlap left to XLA.

Usage: inputs sharded (B, S/n, H, D) on `axis`; call inside
`shard_map` or use the `ring_attention` wrapper which sets one up.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _local_ring(q, k, v, axis: str, causal: bool, scale: float):
    """Per-device body: q,k,v (B, S_loc, H, D)."""
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    b, s_loc, h, d = q.shape
    qf = q.astype(jnp.float32) * scale

    # global positions of the local q rows
    q_pos = idx * s_loc + jnp.arange(s_loc)

    # pvary: mark the fresh accumulators as device-varying so the scan
    # carry type matches after axis-dependent updates
    acc0 = jax.lax.pvary(jnp.zeros((b, s_loc, h, d), jnp.float32), axis)
    m0 = jax.lax.pvary(jnp.full((b, s_loc, h, 1), NEG_INF, jnp.float32), axis)
    l0 = jax.lax.pvary(jnp.zeros((b, s_loc, h, 1), jnp.float32), axis)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, r):
        acc, m_prev, l_prev, kb, vb = carry
        # kb currently holds the block originally on device (idx - r) mod n
        src = (idx - r) % n
        k_pos = src * s_loc + jnp.arange(s_loc)
        s = jnp.einsum("bqhd,bkhd->bqhk", qf, kb.astype(jnp.float32))
        if causal:
            mask = q_pos[:, None] >= k_pos[None, :]
            s = jnp.where(mask[None, :, None, :], s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bqhk,bkhd->bqhd", p, vb.astype(jnp.float32))
        acc = acc * alpha + pv
        kb = jax.lax.ppermute(kb, axis, perm)
        vb = jax.lax.ppermute(vb, axis, perm)
        return (acc, m_new, l_new, kb, vb), None

    (acc, m, l, _, _), _ = jax.lax.scan(
        step, (acc0, m0, l0, k, v), jnp.arange(n)
    )
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,  # (B, S, H, D) — S divisible by mesh axis size
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact attention with sequence sharded over `axis`."""
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        functools.partial(_local_ring, axis=axis, causal=causal, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    sh = NamedSharding(mesh, spec)
    return fn(
        jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh)
    )
