"""Converter completeness: synthesize diffusers-style state dicts whose
keys mirror the real checkpoints, convert, and require the result to
match our init tree leaf-for-leaf (paths AND shapes). Catches missing/
misnamed rules without needing real weights."""

import numpy as np
import pytest

from instructany2pix_tpu.core import tree as tree_util
from instructany2pix_tpu.models import unet as unet_lib
from instructany2pix_tpu.models import unet_convert
from instructany2pix_tpu.models import vae as vae_lib


def _fake_sd_from_tree(flat_ours, inverse_map):
    """inverse_map: ours-path → (torch_key, shape_transform)."""
    sd = {}
    for path, leaf in flat_ours.items():
        tk, tshape = inverse_map(path, leaf)
        sd[tk] = np.random.RandomState(abs(hash(path)) % 2**31).randn(*tshape).astype(
            np.float32
        )
    return sd


def _torch_shape(path, leaf):
    """Map our leaf shape back to the torch checkpoint shape."""
    shape = tuple(leaf.shape)
    if path.endswith(".w"):
        if leaf.ndim == 2:  # linear (in,out) → torch (out,in)
            return (shape[1], shape[0])
        if leaf.ndim == 4:  # conv HWIO → torch OIHW
            return (shape[3], shape[2], shape[0], shape[1])
    return shape


_UNET_NAME_MAP = [
    # (our regex, torch template) — inverse of unet_convert rules
    (r"^conv_in\.w$", "conv_in.weight"),
    (r"^conv_in\.b$", "conv_in.bias"),
    (r"^time_embed\.fc1\.w$", "time_embedding.linear_1.weight"),
    (r"^time_embed\.fc1\.b$", "time_embedding.linear_1.bias"),
    (r"^time_embed\.fc2\.w$", "time_embedding.linear_2.weight"),
    (r"^time_embed\.fc2\.b$", "time_embedding.linear_2.bias"),
    (r"^add_embed\.fc1\.w$", "add_embedding.linear_1.weight"),
    (r"^add_embed\.fc1\.b$", "add_embedding.linear_1.bias"),
    (r"^add_embed\.fc2\.w$", "add_embedding.linear_2.weight"),
    (r"^add_embed\.fc2\.b$", "add_embedding.linear_2.bias"),
    (r"^norm_out\.g$", "conv_norm_out.weight"),
    (r"^norm_out\.b$", "conv_norm_out.bias"),
    (r"^conv_out\.w$", "conv_out.weight"),
    (r"^conv_out\.b$", "conv_out.bias"),
]


def _unet_torch_key(path, leaf):
    import re

    for pat, tpl in _UNET_NAME_MAP:
        if re.match(pat, path):
            return tpl, _torch_shape(path, leaf)

    # block-level translation
    p = path
    p = re.sub(r"^down_(\d+)\.res_(\d+)\.", r"down_blocks.\1.resnets.\2.", p)
    p = re.sub(r"^down_(\d+)\.attn_(\d+)\.", r"down_blocks.\1.attentions.\2.", p)
    p = re.sub(r"^down_(\d+)\.down\.", r"down_blocks.\1.downsamplers.0.conv.", p)
    p = re.sub(r"^up_(\d+)\.res_(\d+)\.", r"up_blocks.\1.resnets.\2.", p)
    p = re.sub(r"^up_(\d+)\.attn_(\d+)\.", r"up_blocks.\1.attentions.\2.", p)
    p = re.sub(r"^up_(\d+)\.up\.", r"up_blocks.\1.upsamplers.0.conv.", p)
    p = re.sub(r"^mid\.res_0\.", "mid_block.resnets.0.", p)
    p = re.sub(r"^mid\.res_1\.", "mid_block.resnets.1.", p)
    p = re.sub(r"^mid\.attn\.", "mid_block.attentions.0.", p)
    # leaf translation
    p = re.sub(r"block_(\d+)\.", r"transformer_blocks.\1.", p)
    for a, b in [
        ("norm1.g", "norm1.weight"), ("norm1.b", "norm1.bias"),
        ("norm2.g", "norm2.weight"), ("norm2.b", "norm2.bias"),
        ("norm3.g", "norm3.weight"), ("norm3.b", "norm3.bias"),
        ("norm.g", "norm.weight"), ("norm.b", "norm.bias"),
        ("time_emb.w", "time_emb_proj.weight"), ("time_emb.b", "time_emb_proj.bias"),
        ("shortcut.w", "conv_shortcut.weight"), ("shortcut.b", "conv_shortcut.bias"),
        ("proj_in.w", "proj_in.weight"), ("proj_in.b", "proj_in.bias"),
        ("proj_out.w", "proj_out.weight"), ("proj_out.b", "proj_out.bias"),
        ("attn1.to_q.w", "attn1.to_q.weight"), ("attn1.to_k.w", "attn1.to_k.weight"),
        ("attn1.to_v.w", "attn1.to_v.weight"),
        ("attn1.to_out.w", "attn1.to_out.0.weight"),
        ("attn1.to_out.b", "attn1.to_out.0.bias"),
        ("attn2.to_q.w", "attn2.to_q.weight"), ("attn2.to_k.w", "attn2.to_k.weight"),
        ("attn2.to_v.w", "attn2.to_v.weight"),
        ("attn2.to_out.w", "attn2.to_out.0.weight"),
        ("attn2.to_out.b", "attn2.to_out.0.bias"),
        ("ff_in.w", "ff.net.0.proj.weight"), ("ff_in.b", "ff.net.0.proj.bias"),
        ("ff_out.w", "ff.net.2.weight"), ("ff_out.b", "ff.net.2.bias"),
        ("conv1.w", "conv1.weight"), ("conv1.b", "conv1.bias"),
        ("conv2.w", "conv2.weight"), ("conv2.b", "conv2.bias"),
    ]:
        if p.endswith("." + a):
            p = p[: -len(a)] + b
            break
    else:
        if p.endswith(".w"):
            p = p[:-2] + ".weight"
        elif p.endswith(".b"):
            p = p[:-2] + ".bias"
        elif p.endswith(".g"):
            p = p[:-2] + ".weight"
    return p, _torch_shape(path, leaf)


def test_unet_converter_covers_every_param(rng):
    cfg = unet_lib.UNetConfig.tiny(with_ip=False)
    ours = unet_lib.init(rng, cfg)
    flat = tree_util.flatten(ours)
    sd = _fake_sd_from_tree(flat, _unet_torch_key)
    converted = unet_convert.convert_unet(sd)
    cflat = tree_util.flatten(converted)
    missing = sorted(set(flat) - set(cflat))
    extra = sorted(set(cflat) - set(flat))
    assert not missing, f"converter misses params: {missing[:8]}"
    assert not extra, f"converter invents params: {extra[:8]}"
    for k in flat:
        assert cflat[k].shape == flat[k].shape, (
            k, cflat[k].shape, flat[k].shape,
        )


def _vae_torch_key(path, leaf):
    import re

    p = path
    p = re.sub(r"^encoder\.down_(\d+)\.res_(\d+)\.", r"encoder.down_blocks.\1.resnets.\2.", p)
    p = re.sub(r"^encoder\.down_(\d+)\.down\.", r"encoder.down_blocks.\1.downsamplers.0.conv.", p)
    p = re.sub(r"^decoder\.up_(\d+)\.res_(\d+)\.", r"decoder.up_blocks.\1.resnets.\2.", p)
    p = re.sub(r"^decoder\.up_(\d+)\.up\.", r"decoder.up_blocks.\1.upsamplers.0.conv.", p)
    p = re.sub(r"^(encoder|decoder)\.mid\.res_(\d)\.", r"\1.mid_block.resnets.\2.", p)
    p = re.sub(r"^(encoder|decoder)\.mid\.attn\.", r"\1.mid_block.attentions.0.", p)
    p = re.sub(r"^encoder\.quant_conv\.", "quant_conv.", p)
    p = re.sub(r"^decoder\.post_quant_conv\.", "post_quant_conv.", p)
    p = re.sub(r"^(encoder|decoder)\.norm_out\.", r"\1.conv_norm_out.", p)
    for a, b in [
        ("norm1.g", "norm1.weight"), ("norm1.b", "norm1.bias"),
        ("norm2.g", "norm2.weight"), ("norm2.b", "norm2.bias"),
        ("norm.g", "group_norm.weight"), ("norm.b", "group_norm.bias"),
        ("shortcut.w", "conv_shortcut.weight"), ("shortcut.b", "conv_shortcut.bias"),
        ("q.w", "to_q.weight"), ("q.b", "to_q.bias"),
        ("k.w", "to_k.weight"), ("k.b", "to_k.bias"),
        ("v.w", "to_v.weight"), ("v.b", "to_v.bias"),
        ("o.w", "to_out.0.weight"), ("o.b", "to_out.0.bias"),
        ("conv1.w", "conv1.weight"), ("conv1.b", "conv1.bias"),
        ("conv2.w", "conv2.weight"), ("conv2.b", "conv2.bias"),
    ]:
        if p.endswith("." + a):
            p = p[: -len(a)] + b
            break
    else:
        if p.endswith(".w"):
            p = p[:-2] + ".weight"
        elif p.endswith(".b"):
            p = p[:-2] + ".bias"
        elif p.endswith(".g"):
            p = p[:-2] + ".weight"
    return p, _torch_shape(path, leaf)


def test_vae_converter_covers_every_param(rng):
    cfg = vae_lib.VAEConfig.tiny()
    ours = vae_lib.init(rng, cfg)
    flat = tree_util.flatten(ours)
    sd = _fake_sd_from_tree(flat, _vae_torch_key)
    converted = unet_convert.convert_vae(sd)
    cflat = tree_util.flatten(converted)
    missing = sorted(set(flat) - set(cflat))
    extra = sorted(set(cflat) - set(flat))
    assert not missing, f"converter misses params: {missing[:8]}"
    assert not extra, f"converter invents params: {extra[:8]}"


def test_cross_attn_paths_count_matches_sdxl():
    cfg = unet_lib.UNetConfig.sdxl_base()
    paths = unet_convert.cross_attn_paths(cfg)
    # SDXL: down (2·2 + 2·10) + up (3·2 + 3·10) + mid 10 = 70 cross-attns
    assert len(paths) == 70
    assert paths[0].startswith("down_1.")
    assert paths[-1] == "mid.attn.block_9.attn2"
