"""ImageBind converter numeric parity vs a hand-built torch module
replicating the official facebookresearch/ImageBind layer definitions
(VERDICT r1 item 4: converters verified beyond key coverage). The torch
side runs the REAL Conv3d rgbt stem over duplicated frames, so the
converter's sum-over-T 2D-conv equivalence is verified numerically too."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instructany2pix_tpu.models import imagebind as ib

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _tiny_cfg():
    return ib.ViTConfig(
        width=32, layers=2, heads=4, patch=4, image_size=16,
        in_channels=3, out_dim=16, pre_ln=True,
    )


def _make_sd(cfg, seed=0):
    """Official-naming state dict for the vision modality."""
    gen = torch.Generator().manual_seed(seed)
    d, mlp = cfg.width, int(cfg.width * cfg.mlp_ratio)
    n_tok = (cfg.image_size // cfg.patch) ** 2 + 1
    sd = {
        # Conv3d stem: (D, 3, T=2, p, p)
        "modality_preprocessors.vision.rgbt_stem.proj.1.weight":
            torch.randn(d, 3, 2, cfg.patch, cfg.patch, generator=gen) * 0.1,
        "modality_preprocessors.vision.cls_token":
            torch.randn(1, 1, d, generator=gen) * 0.1,
        "modality_preprocessors.vision.pos_embedding_helper.pos_embed":
            torch.randn(1, n_tok, d, generator=gen) * 0.1,
        "modality_trunks.vision.pre_transformer_layer.0.weight":
            1 + 0.1 * torch.randn(d, generator=gen),
        "modality_trunks.vision.pre_transformer_layer.0.bias":
            0.1 * torch.randn(d, generator=gen),
        "modality_heads.vision.0.weight": 1 + 0.1 * torch.randn(d, generator=gen),
        "modality_heads.vision.0.bias": 0.1 * torch.randn(d, generator=gen),
        "modality_heads.vision.2.weight":
            torch.randn(cfg.out_dim, d, generator=gen) * 0.1,
    }
    for i in range(cfg.layers):
        b = f"modality_trunks.vision.blocks.{i}"
        sd[f"{b}.norm_1.weight"] = 1 + 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.norm_1.bias"] = 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.attn.in_proj_weight"] = torch.randn(3 * d, d, generator=gen) * 0.1
        sd[f"{b}.attn.in_proj_bias"] = 0.1 * torch.randn(3 * d, generator=gen)
        sd[f"{b}.attn.out_proj.weight"] = torch.randn(d, d, generator=gen) * 0.1
        sd[f"{b}.attn.out_proj.bias"] = 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.norm_2.weight"] = 1 + 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.norm_2.bias"] = 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.mlp.fc1.weight"] = torch.randn(mlp, d, generator=gen) * 0.1
        sd[f"{b}.mlp.fc1.bias"] = 0.1 * torch.randn(mlp, generator=gen)
        sd[f"{b}.mlp.fc2.weight"] = torch.randn(d, mlp, generator=gen) * 0.1
        sd[f"{b}.mlp.fc2.bias"] = 0.1 * torch.randn(d, generator=gen)
    return sd


def _t_ln(sd, p, x):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{p}.weight"], sd[f"{p}.bias"])


def t_imagebind_vision(sd, cfg, x):
    """x: (B, 3, H, W). Official semantics: duplicate to 2 frames, Conv3d
    stride (2, p, p), flatten to tokens, cls+pos, pre-LN trunk with
    torch-MHA-layout attention, head LN→Linear(no bias)→L2-normalize."""
    d, heads = cfg.width, cfg.heads
    v = x.unsqueeze(2).repeat(1, 1, 2, 1, 1)  # (B,3,2,H,W)
    w3 = sd["modality_preprocessors.vision.rgbt_stem.proj.1.weight"]
    h = F.conv3d(v, w3, stride=(2, cfg.patch, cfg.patch))  # (B,D,1,h,w)
    b = h.shape[0]
    h = h.flatten(2).transpose(1, 2)  # (B, N, D)
    cls = sd["modality_preprocessors.vision.cls_token"].expand(b, -1, -1)
    h = torch.cat([cls, h], dim=1)
    h = h + sd["modality_preprocessors.vision.pos_embedding_helper.pos_embed"]
    h = _t_ln(sd, "modality_trunks.vision.pre_transformer_layer.0", h)
    for i in range(cfg.layers):
        blk = f"modality_trunks.vision.blocks.{i}"
        n = _t_ln(sd, f"{blk}.norm_1", h)
        qkv = F.linear(n, sd[f"{blk}.attn.in_proj_weight"], sd[f"{blk}.attn.in_proj_bias"])
        q, k, v_ = qkv.chunk(3, dim=-1)
        hd = d // heads
        def sh(t):
            return t.view(b, -1, heads, hd).transpose(1, 2)
        a = torch.softmax(sh(q) @ sh(k).transpose(-1, -2) / np.sqrt(hd), dim=-1)
        o = (a @ sh(v_)).transpose(1, 2).reshape(b, -1, d)
        h = h + F.linear(o, sd[f"{blk}.attn.out_proj.weight"], sd[f"{blk}.attn.out_proj.bias"])
        n = _t_ln(sd, f"{blk}.norm_2", h)
        m = F.linear(n, sd[f"{blk}.mlp.fc1.weight"], sd[f"{blk}.mlp.fc1.bias"])
        m = F.linear(F.gelu(m), sd[f"{blk}.mlp.fc2.weight"], sd[f"{blk}.mlp.fc2.bias"])
        h = h + m
    pooled = _t_ln(sd, "modality_heads.vision.0", h[:, 0])
    out = F.linear(pooled, sd["modality_heads.vision.2.weight"])
    return out / out.norm(dim=-1, keepdim=True)


def test_vision_converter_full_parity():
    cfg = _tiny_cfg()
    sd = _make_sd(cfg)
    params = ib.convert_from_imagebind(
        {k: v.numpy() for k, v in sd.items()}, modality="vision"
    )
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    with torch.no_grad():
        ref = t_imagebind_vision(sd, cfg, torch.from_numpy(x)).numpy()
    got = np.asarray(
        ib.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_audio_stem_converter_shapes():
    """Audio modality: 1-channel Conv2d stem + stem LayerNorm route."""
    cfg = ib.ViTConfig(
        width=16, layers=1, heads=2, patch=4, image_size=0, in_channels=1,
        stride=2, out_dim=8, out_scale=20.0,
    )
    gen = torch.Generator().manual_seed(1)
    d = cfg.width
    n_patches = ((12 - 4) // 2 + 1) ** 2
    sd = {
        "modality_preprocessors.audio.audio_stem.proj.1.weight":
            torch.randn(d, 1, 4, 4, generator=gen) * 0.1,
        "modality_preprocessors.audio.audio_stem.norm_layer.weight":
            torch.ones(d),
        "modality_preprocessors.audio.audio_stem.norm_layer.bias":
            torch.zeros(d),
        "modality_preprocessors.audio.cls_token": torch.zeros(1, 1, d),
        "modality_preprocessors.audio.pos_embedding_helper.pos_embed":
            torch.randn(1, n_patches + 1, d, generator=gen) * 0.1,
        "modality_heads.audio.0.weight": torch.ones(d),
        "modality_heads.audio.0.bias": torch.zeros(d),
        "modality_heads.audio.2.weight": torch.randn(8, d, generator=gen) * 0.1,
    }
    b = "modality_trunks.audio.blocks.0"
    mlp = int(d * cfg.mlp_ratio)
    sd.update({
        f"{b}.norm_1.weight": torch.ones(d), f"{b}.norm_1.bias": torch.zeros(d),
        f"{b}.attn.in_proj_weight": torch.randn(3 * d, d, generator=gen) * 0.1,
        f"{b}.attn.in_proj_bias": torch.zeros(3 * d),
        f"{b}.attn.out_proj.weight": torch.randn(d, d, generator=gen) * 0.1,
        f"{b}.attn.out_proj.bias": torch.zeros(d),
        f"{b}.norm_2.weight": torch.ones(d), f"{b}.norm_2.bias": torch.zeros(d),
        f"{b}.mlp.fc1.weight": torch.randn(mlp, d, generator=gen) * 0.1,
        f"{b}.mlp.fc1.bias": torch.zeros(mlp),
        f"{b}.mlp.fc2.weight": torch.randn(d, mlp, generator=gen) * 0.1,
        f"{b}.mlp.fc2.bias": torch.zeros(d),
    })
    params = ib.convert_from_imagebind(
        {k: v.numpy() for k, v in sd.items()}, modality="audio"
    )
    assert "patch_norm" in params
    x = jnp.asarray(np.random.RandomState(2).randn(1, 12, 12, 1), jnp.float32)
    out = ib.apply(params, x, cfg)
    assert out.shape == (1, 8)
    # out_scale applied after L2 norm
    np.testing.assert_allclose(float(jnp.linalg.norm(out)), 20.0, rtol=1e-4)


def t_imagebind_audio(sd, cfg, x):
    """x: (B, H, W) mel. Official audio semantics: 1-ch Conv2d stem with
    overlapping stride, token LayerNorm, cls+pos, trunk with
    add_bias_kv=True attention (one learned extra k/v slot), head
    LN→Linear(no bias)→L2-normalize→×20 logit scale."""
    d, heads = cfg.width, cfg.heads
    w = sd["modality_preprocessors.audio.audio_stem.proj.1.weight"]
    h = F.conv2d(x.unsqueeze(1), w, stride=(cfg.stride, cfg.stride))
    b = h.shape[0]
    h = h.flatten(2).transpose(1, 2)
    h = _t_ln(sd, "modality_preprocessors.audio.audio_stem.norm_layer", h)
    cls = sd["modality_preprocessors.audio.cls_token"].expand(b, -1, -1)
    h = torch.cat([cls, h], dim=1)
    h = h + sd["modality_preprocessors.audio.pos_embedding_helper.pos_embed"]
    for i in range(cfg.layers):
        blk = f"modality_trunks.audio.blocks.{i}"
        n = _t_ln(sd, f"{blk}.norm_1", h)
        qkv = F.linear(n, sd[f"{blk}.attn.in_proj_weight"], sd[f"{blk}.attn.in_proj_bias"])
        q, k, v_ = qkv.chunk(3, dim=-1)
        k = torch.cat([k, sd[f"{blk}.attn.bias_k"].expand(b, -1, -1)], dim=1)
        v_ = torch.cat([v_, sd[f"{blk}.attn.bias_v"].expand(b, -1, -1)], dim=1)
        hd = d // heads
        def sh(t):
            return t.view(b, -1, heads, hd).transpose(1, 2)
        a = torch.softmax(sh(q) @ sh(k).transpose(-1, -2) / np.sqrt(hd), dim=-1)
        o = (a @ sh(v_)).transpose(1, 2).reshape(b, -1, d)
        h = h + F.linear(o, sd[f"{blk}.attn.out_proj.weight"], sd[f"{blk}.attn.out_proj.bias"])
        n = _t_ln(sd, f"{blk}.norm_2", h)
        m = F.linear(n, sd[f"{blk}.mlp.fc1.weight"], sd[f"{blk}.mlp.fc1.bias"])
        m = F.linear(F.gelu(m), sd[f"{blk}.mlp.fc2.weight"], sd[f"{blk}.mlp.fc2.bias"])
        h = h + m
    pooled = _t_ln(sd, "modality_heads.audio.0", h[:, 0])
    out = F.linear(pooled, sd["modality_heads.audio.2.weight"])
    return out / out.norm(dim=-1, keepdim=True) * 20.0


def test_audio_converter_full_parity():
    """Full numeric parity of the audio trunk incl. the official
    add_bias_kv=True attention (learned extra k/v slot — previously
    dropped by the converter; this hunt added it)."""
    cfg = ib.ViTConfig(
        width=32, layers=2, heads=4, patch=4, image_size=0, in_channels=1,
        stride=2, out_dim=16, out_scale=20.0,
    )
    gen = torch.Generator().manual_seed(3)
    d, mlp = cfg.width, int(cfg.width * cfg.mlp_ratio)
    hh, ww = 12, 20
    n_tok = ((hh - cfg.patch) // cfg.stride + 1) * ((ww - cfg.patch) // cfg.stride + 1) + 1
    sd = {
        "modality_preprocessors.audio.audio_stem.proj.1.weight":
            torch.randn(d, 1, cfg.patch, cfg.patch, generator=gen) * 0.1,
        "modality_preprocessors.audio.audio_stem.norm_layer.weight":
            1 + 0.1 * torch.randn(d, generator=gen),
        "modality_preprocessors.audio.audio_stem.norm_layer.bias":
            0.1 * torch.randn(d, generator=gen),
        "modality_preprocessors.audio.cls_token":
            torch.randn(1, 1, d, generator=gen) * 0.1,
        "modality_preprocessors.audio.pos_embedding_helper.pos_embed":
            torch.randn(1, n_tok, d, generator=gen) * 0.1,
        "modality_heads.audio.0.weight": 1 + 0.1 * torch.randn(d, generator=gen),
        "modality_heads.audio.0.bias": 0.1 * torch.randn(d, generator=gen),
        "modality_heads.audio.2.weight":
            torch.randn(cfg.out_dim, d, generator=gen) * 0.1,
    }
    for i in range(cfg.layers):
        b = f"modality_trunks.audio.blocks.{i}"
        sd[f"{b}.norm_1.weight"] = 1 + 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.norm_1.bias"] = 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.attn.in_proj_weight"] = torch.randn(3 * d, d, generator=gen) * 0.1
        sd[f"{b}.attn.in_proj_bias"] = 0.1 * torch.randn(3 * d, generator=gen)
        sd[f"{b}.attn.bias_k"] = torch.randn(1, 1, d, generator=gen) * 0.1
        sd[f"{b}.attn.bias_v"] = torch.randn(1, 1, d, generator=gen) * 0.1
        sd[f"{b}.attn.out_proj.weight"] = torch.randn(d, d, generator=gen) * 0.1
        sd[f"{b}.attn.out_proj.bias"] = 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.norm_2.weight"] = 1 + 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.norm_2.bias"] = 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.mlp.fc1.weight"] = torch.randn(mlp, d, generator=gen) * 0.1
        sd[f"{b}.mlp.fc1.bias"] = 0.1 * torch.randn(mlp, generator=gen)
        sd[f"{b}.mlp.fc2.weight"] = torch.randn(d, mlp, generator=gen) * 0.1
        sd[f"{b}.mlp.fc2.bias"] = 0.1 * torch.randn(d, generator=gen)

    params = ib.convert_from_imagebind(
        {k: v.numpy() for k, v in sd.items()}, modality="audio"
    )
    assert "bias_k" in params["block_0"]
    rs = np.random.RandomState(5)
    x = rs.randn(2, hh, ww).astype(np.float32)
    with torch.no_grad():
        want = t_imagebind_audio(sd, cfg, torch.from_numpy(x)).numpy()
    got = np.asarray(ib.apply(params, jnp.asarray(x[..., None]), cfg))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
