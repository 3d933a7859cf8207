"""Model surgery: weight deltas and consolidation.

Rebuild of reference llm/model/make_delta.py / apply_delta.py /
consolidate.py — distribute finetunes as base-relative deltas
(including resized embedding rows for the 9 added special tokens,
reference make_delta.py:19-28) and merge them back.
"""

from __future__ import annotations

from typing import Any, Dict


import numpy as np

from ..core import checkpoint as ckpt_lib
from ..core import tree as tree_util


def _delta_leaf(finetuned: np.ndarray, base: np.ndarray) -> np.ndarray:
    f = np.asarray(finetuned)
    b = np.asarray(base)
    if f.shape == b.shape:
        return f - b
    # resized embedding/head rows: subtract where the base overlaps,
    # keep new rows verbatim (reference make_delta.py:19-28)
    assert f.ndim == b.ndim and f.shape[1:] == b.shape[1:], (f.shape, b.shape)
    out = f.copy()
    n = min(f.shape[0], b.shape[0])
    out[:n] -= b[:n]
    return out


def _apply_leaf(delta: np.ndarray, base: np.ndarray) -> np.ndarray:
    d = np.asarray(delta)
    b = np.asarray(base)
    if d.shape == b.shape:
        return d + b
    out = d.copy()
    n = min(d.shape[0], b.shape[0])
    out[:n] += b[:n]
    return out


def make_delta(finetuned: Dict[str, Any], base: Dict[str, Any]) -> Dict[str, Any]:
    ff = tree_util.flatten(finetuned)
    fb = tree_util.flatten(base)
    out = {}
    for k, v in ff.items():
        out[k] = _delta_leaf(v, fb[k]) if k in fb else np.asarray(v)
    return tree_util.unflatten(out)


def apply_delta(delta: Dict[str, Any], base: Dict[str, Any]) -> Dict[str, Any]:
    fd = tree_util.flatten(delta)
    fb = tree_util.flatten(base)
    out = {}
    for k, v in fd.items():
        out[k] = _apply_leaf(v, fb[k]) if k in fb else np.asarray(v)
    return tree_util.unflatten(out)


def consolidate(src_path: str, dst_path: str) -> None:
    """Re-save a checkpoint in consolidated (single-tree orbax) form —
    reference consolidate.py re-saves sharded HF checkpoints."""
    params = ckpt_lib.restore(src_path)
    ckpt_lib.save(dst_path, params)
