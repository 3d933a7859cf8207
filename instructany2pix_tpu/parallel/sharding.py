"""GSPMD sharding rules — the TPU-native replacement for DeepSpeed
ZeRO-3 + NCCL (reference scripts/zero3.json:16-27, scripts/train.sh:7-9)
and the serving-time tensor parallelism the reference lacks
(SURVEY.md §2.13).

Strategy on the 2D ("data", "model") mesh from core.mesh:
  * Training (ZeRO-3 class): `fsdp_rules` shard every parameter's
    largest axis across BOTH mesh axes — parameters, gradients, and
    optimizer state (which inherits param shardings through jit) are
    fully sharded; XLA inserts the all-gather/reduce-scatter
    collectives the reference got from DeepSpeed.
  * Serving (TP): `llama_tp_rules` / `unet_tp_rules` shard attention
    heads and MLP hidden dims over "model" — column-parallel in
    projections (output dim sharded), row-parallel out-projections
    (input dim sharded) so each block needs one psum, inserted by XLA.
Activations shard batch over "data" via `batch_spec`.
"""

from __future__ import annotations

import contextlib
import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import tree as tree_util
from ..core.mesh import DATA_AXIS, MODEL_AXIS

Rules = Sequence[Tuple[str, P]]


# ---------------------------------------------------------------- FSDP


def fsdp_spec(shape, mesh: Mesh, min_size: int = 1024) -> P:
    """Shard the largest divisible axis across (data, model); replicate
    tiny params."""
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    n_total = mesh.devices.size
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % n_total == 0:
            spec = [None] * len(shape)
            spec[axis] = (DATA_AXIS, MODEL_AXIS)
            return P(*spec)
    # fall back to sharding over just the model axis
    n_model = mesh.shape[MODEL_AXIS]
    for axis in order:
        if shape[axis] % n_model == 0:
            spec = [None] * len(shape)
            spec[axis] = MODEL_AXIS
            return P(*spec)
    return P()


def shard_params_fsdp(params, mesh: Mesh, min_size: int = 1024):
    """Device-put a param pytree fully sharded (ZeRO-3 equivalent)."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, fsdp_spec(x.shape, mesh, min_size))
        ),
        params,
    )


def fsdp_shardings(params, mesh: Mesh, min_size: int = 1024):
    """Matching pytree of NamedShardings (for jit in_shardings)."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, fsdp_spec(x.shape, mesh, min_size)), params
    )


# ------------------------------------------------------------------ TP

# (regex over flat param path, PartitionSpec) — first match wins.
# Quantized trees shard too: column-parallel layers split the output
# dim of w_q / packed w_q4 together with their per-channel "scale" and
# blockwise "gscale" (both N-minor); row-parallel layers split the
# contraction dim — int8 rows split cleanly, int4's half-split nibble
# packing does NOT (byte row i holds logical rows i and i+K/2, so a
# contiguous packed-row shard is a non-contiguous logical shard) →
# quantize_llama(tp_rows_int8=True) keeps o/down at int8 for TP decode.
LLAMA_TP_RULES: Rules = [
    (r"embed_tokens\.w$", P(None, MODEL_AXIS)),
    (r"lm_head\.(w|w_q)$", P(None, MODEL_AXIS)),
    (r"lm_head\.scale$", P(MODEL_AXIS)),
    # TP shards only the UNFUSED projection names: a raw column shard of
    # a fused qkv/gate_up weight crosses the q/k/v (and GQA kv-head)
    # boundaries, so the in-block split would trigger resharding
    # collectives every layer. llama.fuse_projections is a single-device
    # decode transform; use assert_unfused_for_tp before applying these.
    (r"layer_\d+\.(q|k|v)\.(w|w_q|w_q4)$", P(None, MODEL_AXIS)),  # column
    (r"layer_\d+\.(q|k|v)\.scale$", P(MODEL_AXIS)),
    (r"layer_\d+\.(q|k|v)\.gscale$", P(None, MODEL_AXIS)),
    (r"layer_\d+\.o\.(w|w_q)$", P(MODEL_AXIS, None)),  # row parallel
    (r"layer_\d+\.o\.(scale|gscale)$", P()),
    (r"layer_\d+\.(gate|up)\.(w|w_q|w_q4)$", P(None, MODEL_AXIS)),
    (r"layer_\d+\.(gate|up)\.scale$", P(MODEL_AXIS)),
    (r"layer_\d+\.(gate|up)\.gscale$", P(None, MODEL_AXIS)),
    (r"layer_\d+\.down\.(w|w_q)$", P(MODEL_AXIS, None)),
    (r"layer_\d+\.down\.(scale|gscale)$", P()),
    (r".*norm\.g$", P()),
]

UNET_TP_RULES: Rules = [
    # attention projections: heads on the output dim
    (r".*\.attn\d?\.to_(q|k|v|k_ip|v_ip)\.w$", P(None, MODEL_AXIS)),
    (r".*\.attn\d?\.to_out\.w$", P(MODEL_AXIS, None)),
    # ff_in_a/ff_in_g are the split_geglu halves (models/unet.py): each
    # is independently column-parallel, so the geglu midpoint split
    # never crosses a shard boundary (the fused ff_in's contiguous
    # 8d-output shard puts half `a` on devices 0..n/2 and half `g` on
    # the rest — GSPMD repairs that with collective-permutes per block)
    (r".*\.(ff_in|ff_in_a|ff_in_g|fc1)\.w$", P(None, MODEL_AXIS)),
    (r".*\.(ff_out|fc2)\.w$", P(MODEL_AXIS, None)),
    # convs: shard output channels
    (r".*conv\d?\.w$", P(None, None, None, MODEL_AXIS)),
    (r".*\.(down|up|shortcut|conv_in|conv_out)\.w$", P(None, None, None, MODEL_AXIS)),
    (r".*", P()),
]


def assert_unfused_for_tp(params):
    """Raise if the llama tree carries fused qkv/gate_up projections —
    LLAMA_TP_RULES shard the unfused names only (see comment above)."""
    fused = [
        path
        for path in tree_util.flatten(params)
        if ".qkv." in path or ".gate_up." in path
    ]
    if fused:
        raise ValueError(
            "tensor-parallel sharding requires unfused projections; found "
            f"fused params (e.g. {fused[0]!r}). Load the checkpoint without "
            "llama.fuse_projections for TP decode."
        )


def apply_tp_rules(params, mesh: Mesh, rules: Rules):
    """Device-put params according to regex TP rules. Axes that don't
    divide evenly fall back to replication."""
    flat = tree_util.flatten(params)
    out = {}
    n_model = mesh.shape[MODEL_AXIS]
    for path, leaf in flat.items():
        spec = tree_util.match_rules(path, rules) or P()
        # validate divisibility
        ok = True
        for dim, ax in zip(leaf.shape, tuple(spec) + (None,) * len(leaf.shape)):
            if ax is not None:
                size = n_model if ax == MODEL_AXIS else mesh.shape[DATA_AXIS]
                if isinstance(ax, tuple):
                    size = int(np.prod([mesh.shape[a] for a in ax]))
                if dim % size != 0:
                    ok = False
        spec = spec if ok else P()
        out[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return tree_util.unflatten(out)


# ---------------------------------------- activation TP constraints

# When set (via tp_activation_constraints), model code pins its
# activation layouts with with_sharding_constraint instead of leaving
# GSPMD's propagation free to shard the residual stream over heads —
# which it does for the UNet transformer stacks, re-laying activations
# between hidden-sharded and head-sharded layouts with ~160
# collective-permutes per CFG step (BASELINE.md r5 "ruleset comm A/B").
# The pinned layout is plain Megatron: the residual stream replicated
# over "model" / batch over "data"; only the column-parallel
# intermediates (head dim, geglu hidden) carry a "model" shard.
_ACT_MESH: Optional[Mesh] = None


@contextlib.contextmanager
def tp_activation_constraints(mesh: Mesh):
    """Enable Megatron-layout activation pinning inside model code for
    traces performed under this context. The context must be active
    while the function is TRACED (jit .lower() or first call), not when
    it executes."""
    global _ACT_MESH
    prev = _ACT_MESH
    _ACT_MESH = mesh
    try:
        yield
    finally:
        _ACT_MESH = prev


def constrain(x, *axes):
    """`with_sharding_constraint` that is a no-op outside a
    tp_activation_constraints context — model code calls it
    unconditionally. Axes that don't divide the dim fall back to None
    (same guard as apply_tp_rules)."""
    if _ACT_MESH is None:
        return x
    fixed = []
    for dim, ax in zip(x.shape, axes):
        if ax is not None:
            size = int(np.prod([_ACT_MESH.shape[a] for a in (
                ax if isinstance(ax, tuple) else (ax,))]))
            if dim % size != 0:
                ax = None
        fixed.append(ax)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_ACT_MESH, P(*fixed))
    )


# ------------------------------------------- comm-volume accounting

_HLO_SHAPE_RE = re.compile(r"([a-z][a-z0-9]*)\[([0-9,]*)\]")
_HLO_COLL_RE = re.compile(
    r"=\s*(.+?)\s+"
    r"(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)"
    r"(-start)?\("
)
_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "f8e4m3fn": 1, "f8e5m2": 1,
}


def collective_bytes(hlo_text: str) -> dict:
    """Count collective ops and their result bytes in compiled HLO —
    the measured replacement for hand-estimated TP communication volume
    (VERDICT r4 item 3: back the v5e-8 UNet projection with a counted
    number, not an assumption). Async pairs (`-start`/`-done`) count
    once. Usage: `compiled = jax.jit(fn).lower(*args).compile();
    collective_bytes(compiled.as_text())`."""
    out: dict = {}
    for line in hlo_text.splitlines():
        if "-done(" in line or "-done.(" in line:
            continue
        m = _HLO_COLL_RE.search(line)
        if not m:
            continue
        shapes, op = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in _HLO_SHAPE_RE.findall(shapes):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        agg = out.setdefault(op, {"count": 0, "bytes": 0})
        agg["count"] += 1
        agg["bytes"] += nbytes
    return out


def batch_spec(ndim: int) -> P:
    return P(*((DATA_AXIS,) + (None,) * (ndim - 1)))


def batch_shardings(batch, mesh: Mesh):
    return jax.tree.map(
        lambda x: NamedSharding(mesh, batch_spec(getattr(x, "ndim", 0) or 1)), batch
    )
