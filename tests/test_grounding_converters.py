"""Converter completeness for GroundingDINO and SAM via synthetic
official-naming state dicts (same method as test_unet_convert)."""

import numpy as np

from instructany2pix_tpu.core import tree as tree_util
from instructany2pix_tpu.grounding import gdino as gdino_lib
from instructany2pix_tpu.grounding import sam as sam_lib


def _arr(shape):
    return np.zeros(shape, np.float32)


def _fake_gdino_sd(cfg, ours_flat):
    """Build the official key set for the tiny config with shapes taken
    from our init tree (transposed where the converter transposes)."""
    sd = {}

    def lin_t(path):  # torch linear from ours (in,out)
        w = ours_flat[path + ".w"]
        return _arr((w.shape[1], w.shape[0])), _arr((w.shape[1],))

    def ln_t(path):
        g = ours_flat[path + ".g"]
        return _arr(g.shape), _arr(g.shape)

    bb = "backbone.0"
    pe = ours_flat["swin.patch_embed.w"]
    sd[f"{bb}.patch_embed.proj.weight"] = _arr((pe.shape[3], pe.shape[2], pe.shape[0], pe.shape[1]))
    sd[f"{bb}.patch_embed.proj.bias"] = _arr((pe.shape[3],))
    sd[f"{bb}.patch_embed.norm.weight"], sd[f"{bb}.patch_embed.norm.bias"] = ln_t("swin.patch_ln")
    for s in range(len(cfg.swin.depths)):
        for b in range(cfg.swin.depths[s]):
            dst = f"swin.stage{s}_block{b}"
            pre = f"{bb}.layers.{s}.blocks.{b}"
            sd[f"{pre}.norm1.weight"], sd[f"{pre}.norm1.bias"] = ln_t(f"{dst}.ln1")
            sd[f"{pre}.attn.qkv.weight"], sd[f"{pre}.attn.qkv.bias"] = lin_t(f"{dst}.qkv")
            sd[f"{pre}.attn.proj.weight"], sd[f"{pre}.attn.proj.bias"] = lin_t(f"{dst}.proj")
            sd[f"{pre}.attn.relative_position_bias_table"] = _arr(ours_flat[f"{dst}.rel_bias"].shape)
            sd[f"{pre}.norm2.weight"], sd[f"{pre}.norm2.bias"] = ln_t(f"{dst}.ln2")
            sd[f"{pre}.mlp.fc1.weight"], sd[f"{pre}.mlp.fc1.bias"] = lin_t(f"{dst}.fc1")
            sd[f"{pre}.mlp.fc2.weight"], sd[f"{pre}.mlp.fc2.bias"] = lin_t(f"{dst}.fc2")
        if f"swin.merge_{s}.ln.g" in ours_flat:
            sd[f"{bb}.layers.{s}.downsample.norm.weight"], sd[f"{bb}.layers.{s}.downsample.norm.bias"] = ln_t(f"swin.merge_{s}.ln")
            w = ours_flat[f"swin.merge_{s}.proj.w"]
            sd[f"{bb}.layers.{s}.downsample.reduction.weight"] = _arr((w.shape[1], w.shape[0]))
    for i, s in enumerate(cfg.swin.out_stages):
        sd[f"{bb}.norm{i + 1}.weight"], sd[f"{bb}.norm{i + 1}.bias"] = ln_t(f"swin.out_ln_{s}")

    # bert (tiny): reuse HF naming
    from transformers import BertConfig as HFCfg
    from transformers import BertModel
    import torch

    hf = BertModel(
        HFCfg(vocab_size=100, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=4, intermediate_size=64,
              max_position_embeddings=32)
    )
    for k, v in hf.state_dict().items():
        sd[f"bert.{k}"] = v.numpy()

    sd["feat_map.weight"], sd["feat_map.bias"] = lin_t("text_proj")
    n_stages = len(cfg.swin.out_stages)
    for i in range(n_stages):
        cw = ours_flat[f"input_proj_{i}.conv.w"]
        sd[f"input_proj.{i}.0.weight"] = _arr((cw.shape[3], cw.shape[2], cw.shape[0], cw.shape[1]))
        sd[f"input_proj.{i}.0.bias"] = _arr((cw.shape[3],))
        sd[f"input_proj.{i}.1.weight"], sd[f"input_proj.{i}.1.bias"] = ln_t(f"input_proj_{i}.gn")
    if "input_proj_extra.conv.w" in ours_flat:
        cw = ours_flat["input_proj_extra.conv.w"]
        sd[f"input_proj.{n_stages}.0.weight"] = _arr((cw.shape[3], cw.shape[2], cw.shape[0], cw.shape[1]))
        sd[f"input_proj.{n_stages}.0.bias"] = _arr((cw.shape[3],))
        sd[f"input_proj.{n_stages}.1.weight"], sd[f"input_proj.{n_stages}.1.bias"] = ln_t("input_proj_extra.gn")
    sd["transformer.level_embed"] = _arr(ours_flat["level_embed"].shape)

    def mha_t(dst, pre):
        d = ours_flat[f"{dst}.q.w"].shape[0]
        sd[f"{pre}.in_proj_weight"] = _arr((3 * d, d))
        sd[f"{pre}.in_proj_bias"] = _arr((3 * d,))
        sd[f"{pre}.out_proj.weight"] = _arr((d, d))
        sd[f"{pre}.out_proj.bias"] = _arr((d,))

    def deform_t(dst, pre):
        for a, b_ in [("sampling_offsets", "sampling_offsets"),
                      ("attention_weights", "attn_weights"),
                      ("value_proj", "value_proj"), ("output_proj", "out_proj")]:
            w = ours_flat[f"{dst}.{b_}.w"]
            sd[f"{pre}.{a}.weight"] = _arr((w.shape[1], w.shape[0]))
            sd[f"{pre}.{a}.bias"] = _arr((w.shape[1],))

    for i in range(cfg.enc_layers):
        e = f"transformer.encoder.layers.{i}"
        deform_t(f"enc_{i}.img_deform", f"{e}.self_attn")
        sd[f"{e}.norm1.weight"], sd[f"{e}.norm1.bias"] = ln_t(f"enc_{i}.img_ln")
        sd[f"{e}.linear1.weight"], sd[f"{e}.linear1.bias"] = lin_t(f"enc_{i}.img_ffn.fc1")
        sd[f"{e}.linear2.weight"], sd[f"{e}.linear2.bias"] = lin_t(f"enc_{i}.img_ffn.fc2")
        sd[f"{e}.norm2.weight"], sd[f"{e}.norm2.bias"] = ln_t(f"enc_{i}.img_ffn.ln")
        t = f"transformer.encoder.text_layers.{i}"
        mha_t(f"enc_{i}.txt_attn", f"{t}.self_attn")
        sd[f"{t}.norm1.weight"], sd[f"{t}.norm1.bias"] = ln_t(f"enc_{i}.txt_ln")
        sd[f"{t}.linear1.weight"], sd[f"{t}.linear1.bias"] = lin_t(f"enc_{i}.txt_ffn.fc1")
        sd[f"{t}.linear2.weight"], sd[f"{t}.linear2.bias"] = lin_t(f"enc_{i}.txt_ffn.fc2")
        sd[f"{t}.norm2.weight"], sd[f"{t}.norm2.bias"] = ln_t(f"enc_{i}.txt_ffn.ln")
        f_ = f"transformer.encoder.fusion_layers.{i}"
        sd[f"{f_}.layer_norm_v.weight"], sd[f"{f_}.layer_norm_v.bias"] = ln_t(f"enc_{i}.fusion.ln_v")
        sd[f"{f_}.layer_norm_l.weight"], sd[f"{f_}.layer_norm_l.bias"] = ln_t(f"enc_{i}.fusion.ln_l")
        for nm in ("v_proj", "l_proj", "values_v_proj", "values_l_proj", "out_v_proj", "out_l_proj"):
            sd[f"{f_}.attn.{nm}.weight"], sd[f"{f_}.attn.{nm}.bias"] = lin_t(f"enc_{i}.fusion.{nm}")
        sd[f"{f_}.gamma_v"] = _arr(ours_flat[f"enc_{i}.fusion.gamma_v"].shape)
        sd[f"{f_}.gamma_l"] = _arr(ours_flat[f"enc_{i}.fusion.gamma_l"].shape)

    for i in range(cfg.dec_layers):
        dd = f"transformer.decoder.layers.{i}"
        mha_t(f"dec_{i}.self_attn", f"{dd}.self_attn")
        sd[f"{dd}.norm2.weight"], sd[f"{dd}.norm2.bias"] = ln_t(f"dec_{i}.ln1")
        mha_t(f"dec_{i}.txt_cross", f"{dd}.ca_text")
        sd[f"{dd}.catext_norm.weight"], sd[f"{dd}.catext_norm.bias"] = ln_t(f"dec_{i}.ln2")
        deform_t(f"dec_{i}.img_deform", f"{dd}.cross_attn")
        sd[f"{dd}.norm1.weight"], sd[f"{dd}.norm1.bias"] = ln_t(f"dec_{i}.ln3")
        sd[f"{dd}.linear1.weight"], sd[f"{dd}.linear1.bias"] = lin_t(f"dec_{i}.ffn.fc1")
        sd[f"{dd}.linear2.weight"], sd[f"{dd}.linear2.bias"] = lin_t(f"dec_{i}.ffn.fc2")
        sd[f"{dd}.norm3.weight"], sd[f"{dd}.norm3.bias"] = ln_t(f"dec_{i}.ffn.ln")
        for j in range(3):
            sd[f"bbox_embed.{i}.layers.{j}.weight"], sd[f"bbox_embed.{i}.layers.{j}.bias"] = lin_t(f"dec_{i}.box_mlp.fc{j}")

    sd["transformer.tgt_embed.weight"] = _arr(ours_flat["tgt_embed"].shape)
    sd["transformer.enc_output.weight"], sd["transformer.enc_output.bias"] = lin_t("enc_out_proj")
    sd["transformer.enc_output_norm.weight"], sd["transformer.enc_output_norm.bias"] = ln_t("enc_out_ln")
    for j in range(2):
        sd[f"transformer.decoder.ref_point_head.layers.{j}.weight"], sd[
            f"transformer.decoder.ref_point_head.layers.{j}.bias"
        ] = lin_t(f"ref_point_head.fc{j}")
    for j in range(3):
        sd[f"transformer.enc_out_bbox_embed.layers.{j}.weight"], sd[
            f"transformer.enc_out_bbox_embed.layers.{j}.bias"
        ] = lin_t(f"enc_bbox.fc{j}")
    return sd


def test_gdino_converter_covers_every_param(rng):
    import jax

    cfg = gdino_lib.GDinoConfig.tiny()
    ours = gdino_lib.init(jax.random.key(0), cfg)
    flat = tree_util.flatten(ours)
    sd = _fake_gdino_sd(cfg, flat)
    converted = gdino_lib.convert_from_torch(sd, cfg)
    cflat = tree_util.flatten(converted)
    # bert subtree converted through its own (already-parity-tested)
    # converter; compare the rest exactly
    ours_rest = {k: v for k, v in flat.items() if not k.startswith("bert.")}
    conv_rest = {k: v for k, v in cflat.items() if not k.startswith("bert.")}
    missing = sorted(set(ours_rest) - set(conv_rest))
    extra = sorted(set(conv_rest) - set(ours_rest))
    assert not missing, f"missing: {missing[:8]}"
    assert not extra, f"extra: {extra[:8]}"
    for k in ours_rest:
        assert np.shape(conv_rest[k]) == np.shape(ours_rest[k]), (
            k, np.shape(conv_rest[k]), np.shape(ours_rest[k]),
        )
    assert "layer_0" in converted["bert"]


def make_sam_sd(cfg, flat):
    """Official segment-anything checkpoint naming sized for `cfg`
    (values random) — also reused by the full-tree boot fixture
    (tests/ckpt_fixtures.py)."""
    sd = {}

    def lin_t(path):
        w = flat[path + ".w"]
        return _arr((w.shape[1], w.shape[0])), _arr((w.shape[1],))

    def ln_t(path):
        g = flat[path + ".g"]
        return _arr(g.shape), _arr(g.shape)

    pe = flat["encoder.patch_embed.w"]
    sd["image_encoder.patch_embed.proj.weight"] = _arr((pe.shape[3], pe.shape[2], pe.shape[0], pe.shape[1]))
    sd["image_encoder.patch_embed.proj.bias"] = _arr((pe.shape[3],))
    sd["image_encoder.pos_embed"] = _arr(flat["encoder.pos_embed"].shape)
    for i in range(cfg.depth):
        b = f"image_encoder.blocks.{i}"
        dst = f"encoder.block_{i}"
        sd[f"{b}.norm1.weight"], sd[f"{b}.norm1.bias"] = ln_t(f"{dst}.ln1")
        sd[f"{b}.attn.qkv.weight"], sd[f"{b}.attn.qkv.bias"] = lin_t(f"{dst}.qkv")
        sd[f"{b}.attn.proj.weight"], sd[f"{b}.attn.proj.bias"] = lin_t(f"{dst}.proj")
        sd[f"{b}.attn.rel_pos_h"] = _arr(flat[f"{dst}.rel_pos_h"].shape)
        sd[f"{b}.attn.rel_pos_w"] = _arr(flat[f"{dst}.rel_pos_w"].shape)
        sd[f"{b}.norm2.weight"], sd[f"{b}.norm2.bias"] = ln_t(f"{dst}.ln2")
        sd[f"{b}.mlp.lin1.weight"], sd[f"{b}.mlp.lin1.bias"] = lin_t(f"{dst}.fc1")
        sd[f"{b}.mlp.lin2.weight"], sd[f"{b}.mlp.lin2.bias"] = lin_t(f"{dst}.fc2")
    n1 = flat["encoder.neck_conv1.w"]
    sd["image_encoder.neck.0.weight"] = _arr((n1.shape[3], n1.shape[2], n1.shape[0], n1.shape[1]))
    sd["image_encoder.neck.1.weight"], sd["image_encoder.neck.1.bias"] = ln_t("encoder.neck_ln1")
    n2 = flat["encoder.neck_conv2.w"]
    sd["image_encoder.neck.2.weight"] = _arr((n2.shape[3], n2.shape[2], n2.shape[0], n2.shape[1]))
    sd["image_encoder.neck.3.weight"], sd["image_encoder.neck.3.bias"] = ln_t("encoder.neck_ln2")

    d = cfg.out_chans
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = _arr((2, d // 2))
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = _arr((1, d))
    sd["prompt_encoder.not_a_point_embed.weight"] = _arr((1, d))
    sd["prompt_encoder.no_mask_embed.weight"] = _arr((1, d))

    sd["mask_decoder.iou_token.weight"] = _arr(flat["decoder.iou_token"].shape)
    sd["mask_decoder.mask_tokens.weight"] = _arr(flat["decoder.mask_tokens"].shape)
    for i in range(cfg.decoder_depth):
        dd = f"mask_decoder.transformer.layers.{i}"
        for a, ours_name in [("self_attn", "self_attn"),
                             ("cross_attn_token_to_image", "cross_t2i"),
                             ("cross_attn_image_to_token", "cross_i2t")]:
            for proj, nm in [("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"), ("out_proj", "o")]:
                sd[f"{dd}.{a}.{proj}.weight"], sd[f"{dd}.{a}.{proj}.bias"] = lin_t(
                    f"decoder.layer_{i}.{ours_name}.{nm}"
                )
        for j, nm in [(1, "ln1"), (2, "ln2"), (3, "ln3"), (4, "ln4")]:
            sd[f"{dd}.norm{j}.weight"], sd[f"{dd}.norm{j}.bias"] = ln_t(f"decoder.layer_{i}.{nm}")
        sd[f"{dd}.mlp.lin1.weight"], sd[f"{dd}.mlp.lin1.bias"] = lin_t(f"decoder.layer_{i}.fc1")
        sd[f"{dd}.mlp.lin2.weight"], sd[f"{dd}.mlp.lin2.bias"] = lin_t(f"decoder.layer_{i}.fc2")
    for proj, nm in [("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"), ("out_proj", "o")]:
        sd[f"mask_decoder.transformer.final_attn_token_to_image.{proj}.weight"], sd[
            f"mask_decoder.transformer.final_attn_token_to_image.{proj}.bias"
        ] = lin_t(f"decoder.final_attn.{nm}")
    sd["mask_decoder.transformer.norm_final_attn.weight"], sd[
        "mask_decoder.transformer.norm_final_attn.bias"
    ] = ln_t("decoder.final_ln")
    u1 = flat["decoder.up_conv1.w"]  # ours (kh, kw, out, in)
    sd["mask_decoder.output_upscaling.0.weight"] = _arr((u1.shape[3], u1.shape[2], u1.shape[0], u1.shape[1]))
    sd["mask_decoder.output_upscaling.0.bias"] = _arr(flat["decoder.up_conv1.b"].shape)
    sd["mask_decoder.output_upscaling.1.weight"], sd["mask_decoder.output_upscaling.1.bias"] = ln_t("decoder.up_ln")
    u2 = flat["decoder.up_conv2.w"]
    sd["mask_decoder.output_upscaling.3.weight"] = _arr((u2.shape[3], u2.shape[2], u2.shape[0], u2.shape[1]))
    sd["mask_decoder.output_upscaling.3.bias"] = _arr(flat["decoder.up_conv2.b"].shape)
    for i in range(cfg.num_mask_tokens):
        for j in range(3):
            sd[f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.weight"], sd[
                f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.bias"
            ] = lin_t(f"decoder.hyper_{i}.fc{j}")
    for j in range(3):
        sd[f"mask_decoder.iou_prediction_head.layers.{j}.weight"], sd[
            f"mask_decoder.iou_prediction_head.layers.{j}.bias"
        ] = lin_t(f"decoder.iou_head.fc{j}")

    return sd


def test_sam_converter_covers_every_param(rng):
    import jax

    cfg = sam_lib.SAMConfig.tiny()
    ours = sam_lib.init(jax.random.key(0), cfg)
    flat = tree_util.flatten(ours)
    sd = make_sam_sd(cfg, flat)
    converted = sam_lib.convert_from_sam(sd, cfg)
    cflat = tree_util.flatten(converted)
    missing = sorted(set(flat) - set(cflat))
    extra = sorted(set(cflat) - set(flat))
    assert not missing, f"missing: {missing[:10]}"
    assert not extra, f"extra: {extra[:10]}"
    for k in flat:
        assert np.shape(cflat[k]) == np.shape(flat[k]), (
            k, np.shape(cflat[k]), np.shape(flat[k]),
        )
