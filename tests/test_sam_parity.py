"""SAM image-encoder converter numeric parity vs a hand-built torch
mirror of the official segment_anything ImageEncoderViT semantics:
windowed attention with decomposed relative position bias, global
blocks, LayerNorm2d neck (VERDICT r1 item 4 — converters verified
numerically, not just by key coverage)."""

import numpy as np
import pytest

import jax.numpy as jnp

from instructany2pix_tpu.grounding import sam as sam_lib

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _tiny_cfg():
    return sam_lib.SAMConfig(
        img_size=16, patch=4, embed_dim=16, depth=3, heads=2,
        out_chans=8, window=2, global_blocks=(1,),
    )


def _make_sd(cfg, seed=0):
    gen = torch.Generator().manual_seed(seed)
    d = cfg.embed_dim
    tokens = cfg.img_size // cfg.patch
    sd = {
        "image_encoder.patch_embed.proj.weight":
            torch.randn(d, 3, cfg.patch, cfg.patch, generator=gen) * 0.1,
        "image_encoder.patch_embed.proj.bias": 0.1 * torch.randn(d, generator=gen),
        "image_encoder.pos_embed": torch.randn(1, tokens, tokens, d, generator=gen) * 0.1,
        "image_encoder.neck.0.weight": torch.randn(cfg.out_chans, d, 1, 1, generator=gen) * 0.1,
        "image_encoder.neck.1.weight": 1 + 0.1 * torch.randn(cfg.out_chans, generator=gen),
        "image_encoder.neck.1.bias": 0.1 * torch.randn(cfg.out_chans, generator=gen),
        "image_encoder.neck.2.weight": torch.randn(cfg.out_chans, cfg.out_chans, 3, 3, generator=gen) * 0.1,
        "image_encoder.neck.3.weight": 1 + 0.1 * torch.randn(cfg.out_chans, generator=gen),
        "image_encoder.neck.3.bias": 0.1 * torch.randn(cfg.out_chans, generator=gen),
    }
    hd = d // cfg.heads
    for i in range(cfg.depth):
        b = f"image_encoder.blocks.{i}"
        grid = tokens if i in cfg.global_blocks else cfg.window
        n_rel = 2 * grid - 1
        sd[f"{b}.norm1.weight"] = 1 + 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.norm1.bias"] = 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.attn.qkv.weight"] = torch.randn(3 * d, d, generator=gen) * 0.1
        sd[f"{b}.attn.qkv.bias"] = 0.1 * torch.randn(3 * d, generator=gen)
        sd[f"{b}.attn.proj.weight"] = torch.randn(d, d, generator=gen) * 0.1
        sd[f"{b}.attn.proj.bias"] = 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.attn.rel_pos_h"] = torch.randn(n_rel, hd, generator=gen) * 0.1
        sd[f"{b}.attn.rel_pos_w"] = torch.randn(n_rel, hd, generator=gen) * 0.1
        sd[f"{b}.norm2.weight"] = 1 + 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.norm2.bias"] = 0.1 * torch.randn(d, generator=gen)
        sd[f"{b}.mlp.lin1.weight"] = torch.randn(4 * d, d, generator=gen) * 0.1
        sd[f"{b}.mlp.lin1.bias"] = 0.1 * torch.randn(4 * d, generator=gen)
        sd[f"{b}.mlp.lin2.weight"] = torch.randn(d, 4 * d, generator=gen) * 0.1
        sd[f"{b}.mlp.lin2.bias"] = 0.1 * torch.randn(d, generator=gen)
    return sd


# ----------------------------- torch mirror of official SAM semantics


def _t_window_partition(x, w):
    b, hh, ww, c = x.shape
    x = x.view(b, hh // w, w, ww // w, w, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w, w, c)


def _t_window_unpartition(x, w, hw):
    hh, ww = hw
    b = x.shape[0] // (hh // w * ww // w)
    x = x.view(b, hh // w, ww // w, w, w, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, -1)


def _t_attn(sd, p, x, heads, grid):
    """Official Attention.forward with add_decomposed_rel_pos."""
    b, hh, ww, d = x.shape
    hd = d // heads
    qkv = F.linear(x.reshape(b, -1, d), sd[f"{p}.qkv.weight"], sd[f"{p}.qkv.bias"])
    qkv = qkv.reshape(b, hh * ww, 3, heads, hd).permute(2, 0, 3, 1, 4)
    qkv = qkv.reshape(3, b * heads, hh * ww, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * hd**-0.5) @ k.transpose(-2, -1)
    coords = torch.arange(grid)[:, None] - torch.arange(grid)[None, :] + grid - 1
    rh = sd[f"{p}.rel_pos_h"][coords]  # (grid, grid, hd)
    rw = sd[f"{p}.rel_pos_w"][coords]
    r_q = q.reshape(b * heads, hh, ww, hd)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = (
        attn.view(b * heads, hh, ww, hh, ww)
        + rel_h[:, :, :, :, None]
        + rel_w[:, :, :, None, :]
    ).view(b * heads, hh * ww, hh * ww)
    attn = attn.softmax(dim=-1)
    o = (attn @ v).view(b, heads, hh, ww, hd).permute(0, 2, 3, 1, 4).reshape(b, hh, ww, d)
    return F.linear(o, sd[f"{p}.proj.weight"], sd[f"{p}.proj.bias"])


def _t_ln(sd, p, x):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{p}.weight"], sd[f"{p}.bias"])


def t_sam_encoder(sd, cfg, x):
    """x (B, 3, H, W) → neck features (B, C_out, h, w)."""
    h = F.conv2d(x, sd["image_encoder.patch_embed.proj.weight"],
                 sd["image_encoder.patch_embed.proj.bias"],
                 stride=cfg.patch)
    h = h.permute(0, 2, 3, 1)  # (B, h, w, d)
    h = h + sd["image_encoder.pos_embed"]
    for i in range(cfg.depth):
        b = f"image_encoder.blocks.{i}"
        shortcut = h
        n = _t_ln(sd, f"{b}.norm1", h)
        if i in cfg.global_blocks:
            o = _t_attn(sd, f"{b}.attn", n, cfg.heads, n.shape[1])
        else:
            win = _t_window_partition(n, cfg.window)
            o = _t_attn(sd, f"{b}.attn", win, cfg.heads, cfg.window)
            o = _t_window_unpartition(o, cfg.window, h.shape[1:3])
        h = shortcut + o
        n = _t_ln(sd, f"{b}.norm2", h)
        m = F.linear(n, sd[f"{b}.mlp.lin1.weight"], sd[f"{b}.mlp.lin1.bias"])
        m = F.linear(F.gelu(m), sd[f"{b}.mlp.lin2.weight"], sd[f"{b}.mlp.lin2.bias"])
        h = h + m
    h = h.permute(0, 3, 1, 2)
    h = F.conv2d(h, sd["image_encoder.neck.0.weight"])
    # LayerNorm2d: normalize over channel dim per pixel
    h = h.permute(0, 2, 3, 1)
    h = _t_ln(sd, "image_encoder.neck.1", h).permute(0, 3, 1, 2)
    h = F.conv2d(h, sd["image_encoder.neck.2.weight"], padding=1)
    h = h.permute(0, 2, 3, 1)
    h = _t_ln(sd, "image_encoder.neck.3", h).permute(0, 3, 1, 2)
    return h


def test_sam_encoder_converter_parity():
    cfg = _tiny_cfg()
    sd = _make_sd(cfg)
    # converter also needs prompt/decoder keys to not fail? convert uses
    # regex rules — missing prompt/decoder keys are simply absent; build
    # encoder-only params by filtering the converted tree
    params = sam_lib.convert_from_sam(
        {k: v.numpy() for k, v in sd.items()}, cfg
    )
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, cfg.img_size, cfg.img_size).astype(np.float32)
    with torch.no_grad():
        ref = t_sam_encoder(sd, cfg, torch.from_numpy(x)).numpy()
    got = np.asarray(
        sam_lib.encoder_apply(
            params["encoder"], jnp.asarray(x.transpose(0, 2, 3, 1)), cfg
        )
    )
    np.testing.assert_allclose(
        got, ref.transpose(0, 2, 3, 1), atol=3e-5, rtol=1e-4
    )
