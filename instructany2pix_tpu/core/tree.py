"""Param-pytree utilities.

Models in this framework are pure functions over nested-dict parameter
pytrees (`params["blocks_0"]["attn"]["wq"]` style). These helpers give
flat path views for weight import, sharding-rule matching, and
parameter counting.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def flatten(tree: Params, sep: str = ".") -> Dict[str, Any]:
    out = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}{sep}{k}" if prefix else str(k), v)
        else:
            out[prefix] = node

    rec("", tree)
    return out


def unflatten(flat: Dict[str, Any], sep: str = ".") -> Params:
    tree: Params = {}
    for path, leaf in flat.items():
        parts = path.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def map_with_path(fn: Callable[[str, Any], Any], tree: Params) -> Params:
    return unflatten({k: fn(k, v) for k, v in flatten(tree).items()})


def param_count(tree: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def param_bytes(tree: Params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def match_rules(path: str, rules):
    """First regex rule matching `path` wins; returns the rule value."""
    for pattern, value in rules:
        if re.search(pattern, path):
            return value
    return None


def tree_summary(tree: Params, max_rows: int = 0) -> str:
    flat = flatten(tree)
    lines = [f"{k}: {tuple(v.shape)} {v.dtype}" for k, v in flat.items()]
    if max_rows and len(lines) > max_rows:
        lines = lines[:max_rows] + [f"... ({len(flat)} leaves total)"]
    lines.append(f"total params: {param_count(tree):,}")
    return "\n".join(lines)


def assert_trees_close(a, b, atol=1e-5, rtol=1e-5):
    fa, fb = flatten(a), flatten(b)
    assert fa.keys() == fb.keys(), (
        sorted(set(fa) - set(fb))[:5],
        sorted(set(fb) - set(fa))[:5],
    )
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k], dtype=np.float32),
            np.asarray(fb[k], dtype=np.float32),
            atol=atol,
            rtol=rtol,
            err_msg=k,
        )


def cast_floating(tree: Params, dtype) -> Params:
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )
