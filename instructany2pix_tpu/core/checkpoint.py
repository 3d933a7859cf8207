"""Checkpoint IO: Orbax save/restore + torch-checkpoint ingestion.

The reference loads raw `torch.load` bins and HF `from_pretrained`
checkpoints (reference pipeline.py:117-120,142). TPU-side persistence
is Orbax (sharded, async-capable); `load_torch_state_dict` ingests
torch `.bin` / `.safetensors` files once, and per-model converter maps
(in each model module) rename+transpose into our param pytrees.

Key convention difference handled by converters: torch `nn.Linear`
stores weight as (out, in); our matmuls are `x @ w` with w (in, out),
so linear weights are transposed on import. Conv weights go
OIHW → HWIO.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np

from . import tree as tree_util


def save(path: str, params) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def restore(path: str, like=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like
        )
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .bin/.pt (pickle) or .safetensors file into numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def linear_w(t: np.ndarray) -> np.ndarray:
    """torch Linear weight (out,in) → ours (in,out)."""
    return np.ascontiguousarray(t.T)


def conv_w(t: np.ndarray) -> np.ndarray:
    """torch Conv2d weight OIHW → lax.conv HWIO."""
    return np.ascontiguousarray(np.transpose(t, (2, 3, 1, 0)))


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    rules,
    strict: bool = True,
) -> Dict[str, Any]:
    """Apply (torch_key_regex → (our_path_template, transform)) rules.

    `rules` is a list of (pattern, path_template, transform_fn|None).
    Regex groups from the pattern are substituted into path_template
    (`\\1` style). Returns a nested param dict.
    """
    import re

    flat: Dict[str, np.ndarray] = {}
    unused = []
    for k, v in sd.items():
        for pattern, template, transform in rules:
            m = re.fullmatch(pattern, k)
            if m:
                path = m.expand(template)
                flat[path] = transform(v) if transform else v
                break
        else:
            unused.append(k)
    if strict and unused:
        raise KeyError(f"Unconverted torch keys ({len(unused)}): {unused[:10]}")
    return tree_util.unflatten(flat)
