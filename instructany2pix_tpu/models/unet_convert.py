"""Diffusers SDXL UNet / AutoencoderKL state-dict converters.

Maps diffusers checkpoint naming (the format the reference loads via
`from_pretrained`, reference pipeline.py:101,128) into this framework's
param pytrees. Linear weights transpose (out,in)→(in,out); convs
OIHW→HWIO (see core/checkpoint.py).

`cross_attn_paths` enumerates cross-attention param paths in the
diffusers `attn_processors` traversal order — down_blocks, up_blocks,
then mid_block (torch module-registration order) — which is the order
the reference's ip_adapter ModuleList checkpoint is indexed by
(reference diffusion/ip_adapter/ip_adapter.py:144-169).
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np

from ..core import checkpoint as ckpt
from . import unet as unet_lib


_L = ckpt.linear_w
_C = ckpt.conv_w


def _resnet_rules(src: str, dst: str):
    return [
        (rf"{src}\.norm1\.weight", rf"{dst}.norm1.g", None),
        (rf"{src}\.norm1\.bias", rf"{dst}.norm1.b", None),
        (rf"{src}\.conv1\.weight", rf"{dst}.conv1.w", _C),
        (rf"{src}\.conv1\.bias", rf"{dst}.conv1.b", None),
        (rf"{src}\.time_emb_proj\.weight", rf"{dst}.time_emb.w", _L),
        (rf"{src}\.time_emb_proj\.bias", rf"{dst}.time_emb.b", None),
        (rf"{src}\.norm2\.weight", rf"{dst}.norm2.g", None),
        (rf"{src}\.norm2\.bias", rf"{dst}.norm2.b", None),
        (rf"{src}\.conv2\.weight", rf"{dst}.conv2.w", _C),
        (rf"{src}\.conv2\.bias", rf"{dst}.conv2.b", None),
        (rf"{src}\.conv_shortcut\.weight", rf"{dst}.shortcut.w", _C),
        (rf"{src}\.conv_shortcut\.bias", rf"{dst}.shortcut.b", None),
    ]


def _transformer_rules(src: str, dst: str):
    # named group: src may already contain numbered groups (down/up
    # block indices), so \1 would be wrong for the transformer index
    tb = rf"{src}\.transformer_blocks\.(?P<tb>\d+)"
    td = rf"{dst}.block_\g<tb>"
    return [
        (rf"{src}\.norm\.weight", rf"{dst}.norm.g", None),
        (rf"{src}\.norm\.bias", rf"{dst}.norm.b", None),
        (rf"{src}\.proj_in\.weight", rf"{dst}.proj_in.w", _L),
        (rf"{src}\.proj_in\.bias", rf"{dst}.proj_in.b", None),
        (rf"{src}\.proj_out\.weight", rf"{dst}.proj_out.w", _L),
        (rf"{src}\.proj_out\.bias", rf"{dst}.proj_out.b", None),
        (rf"{tb}\.norm1\.weight", rf"{td}.norm1.g", None),
        (rf"{tb}\.norm1\.bias", rf"{td}.norm1.b", None),
        (rf"{tb}\.attn1\.to_q\.weight", rf"{td}.attn1.to_q.w", _L),
        (rf"{tb}\.attn1\.to_k\.weight", rf"{td}.attn1.to_k.w", _L),
        (rf"{tb}\.attn1\.to_v\.weight", rf"{td}.attn1.to_v.w", _L),
        (rf"{tb}\.attn1\.to_out\.0\.weight", rf"{td}.attn1.to_out.w", _L),
        (rf"{tb}\.attn1\.to_out\.0\.bias", rf"{td}.attn1.to_out.b", None),
        (rf"{tb}\.norm2\.weight", rf"{td}.norm2.g", None),
        (rf"{tb}\.norm2\.bias", rf"{td}.norm2.b", None),
        (rf"{tb}\.attn2\.to_q\.weight", rf"{td}.attn2.to_q.w", _L),
        (rf"{tb}\.attn2\.to_k\.weight", rf"{td}.attn2.to_k.w", _L),
        (rf"{tb}\.attn2\.to_v\.weight", rf"{td}.attn2.to_v.w", _L),
        (rf"{tb}\.attn2\.to_out\.0\.weight", rf"{td}.attn2.to_out.w", _L),
        (rf"{tb}\.attn2\.to_out\.0\.bias", rf"{td}.attn2.to_out.b", None),
        (rf"{tb}\.norm3\.weight", rf"{td}.norm3.g", None),
        (rf"{tb}\.norm3\.bias", rf"{td}.norm3.b", None),
        (rf"{tb}\.ff\.net\.0\.proj\.weight", rf"{td}.ff_in.w", _L),
        (rf"{tb}\.ff\.net\.0\.proj\.bias", rf"{td}.ff_in.b", None),
        (rf"{tb}\.ff\.net\.2\.weight", rf"{td}.ff_out.w", _L),
        (rf"{tb}\.ff\.net\.2\.bias", rf"{td}.ff_out.b", None),
    ]


def unet_rules():
    rules = [
        (r"conv_in\.weight", r"conv_in.w", _C),
        (r"conv_in\.bias", r"conv_in.b", None),
        (r"time_embedding\.linear_1\.weight", r"time_embed.fc1.w", _L),
        (r"time_embedding\.linear_1\.bias", r"time_embed.fc1.b", None),
        (r"time_embedding\.linear_2\.weight", r"time_embed.fc2.w", _L),
        (r"time_embedding\.linear_2\.bias", r"time_embed.fc2.b", None),
        (r"add_embedding\.linear_1\.weight", r"add_embed.fc1.w", _L),
        (r"add_embedding\.linear_1\.bias", r"add_embed.fc1.b", None),
        (r"add_embedding\.linear_2\.weight", r"add_embed.fc2.w", _L),
        (r"add_embedding\.linear_2\.bias", r"add_embed.fc2.b", None),
        (r"conv_norm_out\.weight", r"norm_out.g", None),
        (r"conv_norm_out\.bias", r"norm_out.b", None),
        (r"conv_out\.weight", r"conv_out.w", _C),
        (r"conv_out\.bias", r"conv_out.b", None),
    ]
    rules += _resnet_rules(r"down_blocks\.(\d+)\.resnets\.(\d+)", r"down_\1.res_\2")
    rules += _transformer_rules(
        r"down_blocks\.(\d+)\.attentions\.(\d+)", r"down_\1.attn_\2"
    )
    rules += [
        (r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.weight", r"down_\1.down.w", _C),
        (r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.bias", r"down_\1.down.b", None),
    ]
    rules += _resnet_rules(r"mid_block\.resnets\.0", r"mid.res_0")
    rules += _resnet_rules(r"mid_block\.resnets\.1", r"mid.res_1")
    rules += _transformer_rules(r"mid_block\.attentions\.0", r"mid.attn")
    rules += _resnet_rules(r"up_blocks\.(\d+)\.resnets\.(\d+)", r"up_\1.res_\2")
    rules += _transformer_rules(r"up_blocks\.(\d+)\.attentions\.(\d+)", r"up_\1.attn_\2")
    rules += [
        (r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.weight", r"up_\1.up.w", _C),
        (r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.bias", r"up_\1.up.b", None),
        (r"time_proj\..*", r"__drop__", None),
        (r"add_time_proj\..*", r"__drop__", None),
    ]
    return rules


def convert_unet(sd: Dict[str, np.ndarray]) -> dict:
    tree = ckpt.convert_state_dict(sd, unet_rules(), strict=True)
    tree.pop("__drop__", None)
    return tree


def _vae_attn_rules(src: str, dst: str):
    # modern (to_q) and legacy (query/proj_attn) namings both map
    out = []
    for a, b in [
        ("group_norm", "norm"),
        ("to_q", "q"), ("to_k", "k"), ("to_v", "v"),
        ("query", "q"), ("key", "k"), ("value", "v"),
    ]:
        tgt_wb = ("g", "b") if a == "group_norm" else ("w", "b")
        tr = None if a == "group_norm" else _L
        out.append((rf"{src}\.{a}\.weight", rf"{dst}.{b}.{tgt_wb[0]}", tr))
        out.append((rf"{src}\.{a}\.bias", rf"{dst}.{b}.{tgt_wb[1]}", None))
    out.append((rf"{src}\.to_out\.0\.weight", rf"{dst}.o.w", _L))
    out.append((rf"{src}\.to_out\.0\.bias", rf"{dst}.o.b", None))
    out.append((rf"{src}\.proj_attn\.weight", rf"{dst}.o.w", _L))
    out.append((rf"{src}\.proj_attn\.bias", rf"{dst}.o.b", None))
    return out


def _vae_resnet_rules(src: str, dst: str):
    out = []
    for a, b, tr in [
        ("norm1.weight", "norm1.g", None), ("norm1.bias", "norm1.b", None),
        ("conv1.weight", "conv1.w", _C), ("conv1.bias", "conv1.b", None),
        ("norm2.weight", "norm2.g", None), ("norm2.bias", "norm2.b", None),
        ("conv2.weight", "conv2.w", _C), ("conv2.bias", "conv2.b", None),
        ("conv_shortcut.weight", "shortcut.w", _C), ("conv_shortcut.bias", "shortcut.b", None),
        ("nin_shortcut.weight", "shortcut.w", _C), ("nin_shortcut.bias", "shortcut.b", None),
    ]:
        out.append((rf"{src}\.{re.escape(a)}", rf"{dst}.{b}", tr))
    return out


def vae_rules():
    rules = [
        (r"encoder\.conv_in\.weight", r"encoder.conv_in.w", _C),
        (r"encoder\.conv_in\.bias", r"encoder.conv_in.b", None),
        (r"encoder\.conv_norm_out\.weight", r"encoder.norm_out.g", None),
        (r"encoder\.conv_norm_out\.bias", r"encoder.norm_out.b", None),
        (r"encoder\.conv_out\.weight", r"encoder.conv_out.w", _C),
        (r"encoder\.conv_out\.bias", r"encoder.conv_out.b", None),
        (r"quant_conv\.weight", r"encoder.quant_conv.w", _C),
        (r"quant_conv\.bias", r"encoder.quant_conv.b", None),
        (r"post_quant_conv\.weight", r"decoder.post_quant_conv.w", _C),
        (r"post_quant_conv\.bias", r"decoder.post_quant_conv.b", None),
        (r"decoder\.conv_in\.weight", r"decoder.conv_in.w", _C),
        (r"decoder\.conv_in\.bias", r"decoder.conv_in.b", None),
        (r"decoder\.conv_norm_out\.weight", r"decoder.norm_out.g", None),
        (r"decoder\.conv_norm_out\.bias", r"decoder.norm_out.b", None),
        (r"decoder\.conv_out\.weight", r"decoder.conv_out.w", _C),
        (r"decoder\.conv_out\.bias", r"decoder.conv_out.b", None),
    ]
    rules += _vae_resnet_rules(
        r"encoder\.down_blocks\.(\d+)\.resnets\.(\d+)", r"encoder.down_\1.res_\2"
    )
    rules += [
        (
            r"encoder\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.weight",
            r"encoder.down_\1.down.w",
            _C,
        ),
        (
            r"encoder\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.bias",
            r"encoder.down_\1.down.b",
            None,
        ),
    ]
    for side in ("encoder", "decoder"):
        rules += _vae_resnet_rules(
            rf"{side}\.mid_block\.resnets\.0", rf"{side}.mid.res_0"
        )
        rules += _vae_resnet_rules(
            rf"{side}\.mid_block\.resnets\.1", rf"{side}.mid.res_1"
        )
        rules += _vae_attn_rules(
            rf"{side}\.mid_block\.attentions\.0", rf"{side}.mid.attn"
        )
    rules += _vae_resnet_rules(
        r"decoder\.up_blocks\.(\d+)\.resnets\.(\d+)", r"decoder.up_\1.res_\2"
    )
    rules += [
        (
            r"decoder\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.weight",
            r"decoder.up_\1.up.w",
            _C,
        ),
        (
            r"decoder\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.bias",
            r"decoder.up_\1.up.b",
            None,
        ),
    ]
    return rules


def convert_vae(sd: Dict[str, np.ndarray]) -> dict:
    tree = ckpt.convert_state_dict(sd, vae_rules(), strict=True)
    tree.pop("__drop__", None)
    return tree


def load_unet(path: str, cfg) -> dict:
    from ..loaders import _load_sharded_hf

    return convert_unet(_load_sharded_hf(path))


def load_vae(path: str, cfg) -> dict:
    from ..loaders import _load_sharded_hf

    return convert_vae(_load_sharded_hf(path))


# ------------------------------------------------------- ip-adapter merge


def cross_attn_paths(cfg: unet_lib.UNetConfig) -> List[str]:
    """Cross-attn (attn2) param paths in diffusers attn_processors
    order: down_blocks → up_blocks → mid_block (module registration
    order), transformer blocks depth-first within."""
    paths = []
    for i, btype in enumerate(cfg.down_block_types):
        if btype != "CrossAttnDownBlock2D":
            continue
        for j in range(cfg.layers_per_block):
            for k in range(cfg.transformer_layers_per_block[i]):
                paths.append(f"down_{i}.attn_{j}.block_{k}.attn2")
    rev_types = list(reversed(cfg.down_block_types))
    rev_depth = list(reversed(cfg.transformer_layers_per_block))
    for i, btype in enumerate(rev_types):
        if btype != "CrossAttnDownBlock2D":
            continue
        for j in range(cfg.layers_per_block + 1):
            for k in range(rev_depth[i]):
                paths.append(f"up_{i}.attn_{j}.block_{k}.attn2")
    for k in range(cfg.transformer_layers_per_block[-1]):
        paths.append(f"mid.attn.block_{k}.attn2")
    return paths


def all_attn_paths(cfg: unet_lib.UNetConfig) -> List[str]:
    """EVERY attention's param path (attn1 and attn2 interleaved per
    transformer block) in diffusers attn_processors order — the index
    space of FaceID checkpoints, whose LoRA ModuleList covers self- and
    cross-attention alike (reference ip_adapter_faceid.py:146-166,
    load at :181-183)."""
    paths = []

    def block(prefix, depth):
        for k in range(depth):
            paths.append(f"{prefix}.block_{k}.attn1")
            paths.append(f"{prefix}.block_{k}.attn2")

    for i, btype in enumerate(cfg.down_block_types):
        if btype != "CrossAttnDownBlock2D":
            continue
        for j in range(cfg.layers_per_block):
            block(f"down_{i}.attn_{j}", cfg.transformer_layers_per_block[i])
    rev_types = list(reversed(cfg.down_block_types))
    rev_depth = list(reversed(cfg.transformer_layers_per_block))
    for i, btype in enumerate(rev_types):
        if btype != "CrossAttnDownBlock2D":
            continue
        for j in range(cfg.layers_per_block + 1):
            block(f"up_{i}.attn_{j}", rev_depth[i])
    block("mid.attn", cfg.transformer_layers_per_block[-1])
    return paths


def merge_ip_weights(unet_params: dict, ip_attn: Dict[str, dict]) -> dict:
    """Install to_k_ip/to_v_ip leaves into the UNet tree at each
    cross-attn path."""
    from ..core import tree as tree_util

    flat = tree_util.flatten(unet_params)
    for path, sub in ip_attn.items():
        flat[f"{path}.to_k_ip.w"] = sub["to_k_ip"]["w"]
        flat[f"{path}.to_v_ip.w"] = sub["to_v_ip"]["w"]
    return tree_util.unflatten(flat)
