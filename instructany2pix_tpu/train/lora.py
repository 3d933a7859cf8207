"""LoRA finetuning utilities.

Rebuild of the reference's PEFT wrap (reference train.py:814-831:
`find_all_linear_names` over the LLM, r/alpha knobs,
`modules_to_save=[vae_predictor_image, vae_predictor_audio, lm_head]`).
LoRA factors live inside each linear's param dict (models/layers.linear
applies them when present), so the same pytree flows through every
model and sharding rule unchanged.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax


from ..core import tree as tree_util
from ..core.prng import KeyChain
from ..models import layers as L

# every llama linear, like the reference's find_all_linear_names
DEFAULT_TARGETS = (r"layer_\d+\.(q|k|v|o|gate|up|down)$",)
# heads trained in full alongside the adapters
DEFAULT_FULL_TRAIN = (
    r"^vae_predictor_image\.",
    r"^vae_predictor_audio\.",
    r"^lm_head\.",
)


def _linear_dirs(params):
    """Yield (path, subdict) for every linear-shaped param dict."""
    out = []

    def rec(prefix, node):
        if isinstance(node, dict):
            if "w" in node and not isinstance(node["w"], dict) and getattr(
                node["w"], "ndim", 0
            ) == 2:
                out.append((prefix, node))
            for k, v in node.items():
                rec(f"{prefix}.{k}" if prefix else k, v)

    rec("", params)
    return out


def apply_lora(
    params,
    key,
    rank: int = 8,
    alpha: float = 16.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
):
    """Attach LoRA factors to matching linears (in place on a copied
    tree). Returns the new params tree."""
    import copy

    params = copy.copy(params)
    flat_dirs = _linear_dirs(params)
    kc = KeyChain(key)
    for path, node in flat_dirs:
        if any(re.search(t, path) for t in targets):
            new = L.add_lora(node, kc(), rank, alpha)
            # write back along the path
            parts = path.split(".")
            cur = params
            for p_ in parts[:-1]:
                cur = cur[p_]
            cur[parts[-1]] = new
    return params


def trainable_mask(
    params,
    targets: Sequence[str] = DEFAULT_TARGETS,
    full_train: Sequence[str] = DEFAULT_FULL_TRAIN,
):
    """Boolean pytree: True where gradients should flow (LoRA factors +
    fully-trained heads), False for frozen base weights."""
    flat = tree_util.flatten(params)
    mask = {}
    for path in flat:
        is_lora = path.endswith(("lora_a", "lora_b"))
        is_full = any(re.search(t, path) for t in full_train)
        mask[path] = bool(is_lora or is_full)
    return tree_util.unflatten(mask)


def merge_lora(params):
    """Fold LoRA factors into the base weights (reference
    llm/model/builder.py LoRA-merge path)."""

    def merge(node):
        if isinstance(node, dict):
            if "lora_a" in node:
                w = node["w"] + (node["lora_a"] @ node["lora_b"]) * node["lora_scale"]
                return {k: v for k, v in node.items() if not k.startswith("lora")} | {
                    "w": w
                }
            return {k: merge(v) for k, v in node.items()}
        return node

    return merge(params)


def split_lora_state(params):
    """Separate adapter-only leaves for LoRA-split checkpointing
    (reference train.py:917-927)."""
    flat = tree_util.flatten(params)
    adapters = {k: v for k, v in flat.items() if "lora" in k.split(".")[-1]}
    return tree_util.unflatten(adapters)
