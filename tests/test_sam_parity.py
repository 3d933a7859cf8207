"""SAM image-encoder converter numeric parity vs a hand-built torch
mirror of the official segment_anything ImageEncoderViT semantics:
windowed attention with decomposed relative position bias, global
blocks, LayerNorm2d neck (VERDICT r1 item 4 — converters verified
numerically, not just by key coverage)."""

import numpy as np
import pytest

import jax
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


def test_two_way_decoder_torch_golden_parity():
    """Full mask-decoder glue golden parity: torch modules per the
    official segment-anything TwoWayTransformer + MaskDecoder
    (skip-first-layer-pe self-attn REPLACING queries, pe on q/k only —
    values raw, downsample-rate-2 cross attentions, ConvTranspose
    upscaling + hypernetwork mask heads + IoU MLP) vs
    `sam.decoder_apply`. This hunt FOUND two glue bugs: values carrying
    positional embeddings and a wrong first-layer residual."""
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    d, heads, depth, mlp_dim = 32, 4, 2, 64
    g, b, n_prompt, n_mask = 4, 2, 3, 4

    class TAttn(nn.Module):
        def __init__(self, rate=1):
            super().__init__()
            inner = d // rate
            self.q_proj = nn.Linear(d, inner)
            self.k_proj = nn.Linear(d, inner)
            self.v_proj = nn.Linear(d, inner)
            self.out_proj = nn.Linear(inner, d)
            self.inner = inner

        def forward(self, q, k, v):
            q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
            hd = self.inner // heads

            def sh(t):
                return t.view(b, -1, heads, hd).transpose(1, 2)

            q, k, v = sh(q), sh(k), sh(v)
            a = (q @ k.transpose(-1, -2)) / (hd ** 0.5)
            o = (a.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, -1, self.inner)
            return self.out_proj(o)

    class Block(nn.Module):
        def __init__(self, first):
            super().__init__()
            self.first = first
            self.self_attn = TAttn()
            self.norm1 = nn.LayerNorm(d)
            self.cross_t2i = TAttn(2)
            self.norm2 = nn.LayerNorm(d)
            self.lin1 = nn.Linear(d, mlp_dim)
            self.lin2 = nn.Linear(mlp_dim, d)
            self.norm3 = nn.LayerNorm(d)
            self.cross_i2t = TAttn(2)
            self.norm4 = nn.LayerNorm(d)

        def forward(self, queries, keys, qpe, kpe):
            if self.first:
                queries = self.self_attn(queries, queries, queries)
            else:
                q = queries + qpe
                queries = queries + self.self_attn(q, q, queries)
            queries = self.norm1(queries)
            queries = queries + self.cross_t2i(queries + qpe, keys + kpe, keys)
            queries = self.norm2(queries)
            queries = queries + self.lin2(torch.relu(self.lin1(queries)))
            queries = self.norm3(queries)
            keys = keys + self.cross_i2t(keys + kpe, queries + qpe, queries)
            keys = self.norm4(keys)
            return queries, keys

    torch.manual_seed(0)
    blocks = nn.ModuleList([Block(i == 0) for i in range(depth)]).eval()
    final_attn = TAttn(2).eval()
    norm_final = nn.LayerNorm(d)
    upc1 = nn.ConvTranspose2d(d, d // 4, 2, stride=2)
    up_ln = nn.LayerNorm(d // 4)
    upc2 = nn.ConvTranspose2d(d // 4, d // 8, 2, stride=2)
    hypers = nn.ModuleList([
        nn.Sequential(nn.Linear(d, d), nn.ReLU(), nn.Linear(d, d), nn.ReLU(),
                      nn.Linear(d, d // 8)) for _ in range(n_mask)
    ])
    iou_head = nn.Sequential(nn.Linear(d, d), nn.ReLU(), nn.Linear(d, d),
                             nn.ReLU(), nn.Linear(d, n_mask))

    rs = np.random.RandomState(2)
    iou_tok = rs.randn(1, d).astype(np.float32)
    mask_toks = rs.randn(n_mask, d).astype(np.float32)
    sparse = rs.randn(b, n_prompt, d).astype(np.float32)
    img_embed = rs.randn(b, g, g, d).astype(np.float32)
    img_pe = rs.randn(1, g, g, d).astype(np.float32)

    with torch.no_grad():
        tokens = torch.cat([
            torch.from_numpy(iou_tok).expand(b, -1, -1),
            torch.from_numpy(mask_toks).expand(b, -1, -1),
            torch.from_numpy(sparse),
        ], dim=1)
        keys = torch.from_numpy(img_embed).reshape(b, g * g, d)
        kpe = torch.from_numpy(img_pe).reshape(1, g * g, d).expand(b, -1, -1)
        queries = tokens
        for blk in blocks:
            queries, keys = blk(queries, keys, tokens, kpe)
        queries = queries + final_attn(queries + tokens, keys + kpe, keys)
        queries = norm_final(queries)
        iou_want = iou_head(queries[:, 0])
        mask_tok_out = queries[:, 1:1 + n_mask]
        src2 = keys.transpose(1, 2).reshape(b, d, g, g)
        up = upc1(src2)
        up = up_ln(up.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        up = torch.nn.functional.gelu(up)
        up = torch.nn.functional.gelu(upc2(up))  # (b, d/8, 4g, 4g)
        hyper = torch.stack([hypers[i](mask_tok_out[:, i]) for i in range(n_mask)], 1)
        masks_want = torch.einsum("bmc,bchw->bmhw", hyper, up)

    from instructany2pix_tpu.grounding import sam as S

    def lin_t(m):
        return {"w": np.ascontiguousarray(m.weight.detach().numpy().T),
                "b": m.bias.detach().numpy()}

    def attn_t(m):
        return {"q": lin_t(m.q_proj), "k": lin_t(m.k_proj),
                "v": lin_t(m.v_proj), "o": lin_t(m.out_proj)}

    def ln_t(m):
        return {"g": m.weight.detach().numpy(), "b": m.bias.detach().numpy()}

    def mlp_t(seq):
        return {f"fc{j}": lin_t(seq[2 * j]) for j in range(3)}

    cfg = S.SAMConfig.tiny()
    cfg = S.SAMConfig(
        img_size=cfg.img_size, patch=cfg.patch, embed_dim=cfg.embed_dim,
        depth=cfg.depth, heads=heads, window=cfg.window,
        global_blocks=cfg.global_blocks, out_chans=d, decoder_depth=depth,
        decoder_heads=heads, decoder_mlp=mlp_dim, num_mask_tokens=n_mask,
    )
    p = {
        "iou_token": jnp.asarray(iou_tok),
        "mask_tokens": jnp.asarray(mask_toks),
        "final_attn": jax.tree.map(jnp.asarray, attn_t(final_attn)),
        "final_ln": jax.tree.map(jnp.asarray, ln_t(norm_final)),
        "up_conv1": {
            # torch ConvTranspose2d weight (in, out, kh, kw) → HWOI
            "w": jnp.asarray(np.ascontiguousarray(
                upc1.weight.detach().numpy().transpose(2, 3, 1, 0)[::-1, ::-1])),
            "b": jnp.asarray(upc1.bias.detach().numpy()),
        },
        "up_ln": jax.tree.map(jnp.asarray, ln_t(up_ln)),
        "up_conv2": {
            "w": jnp.asarray(np.ascontiguousarray(
                upc2.weight.detach().numpy().transpose(2, 3, 1, 0)[::-1, ::-1])),
            "b": jnp.asarray(upc2.bias.detach().numpy()),
        },
        "iou_head": jax.tree.map(jnp.asarray, mlp_t(iou_head)),
    }
    for i in range(n_mask):
        p[f"hyper_{i}"] = jax.tree.map(jnp.asarray, mlp_t(hypers[i]))
    for i, blk in enumerate(blocks):
        p[f"layer_{i}"] = jax.tree.map(jnp.asarray, {
            "self_attn": attn_t(blk.self_attn),
            "ln1": ln_t(blk.norm1),
            "cross_t2i": attn_t(blk.cross_t2i),
            "ln2": ln_t(blk.norm2),
            "fc1": lin_t(blk.lin1),
            "fc2": lin_t(blk.lin2),
            "ln3": ln_t(blk.norm3),
            "cross_i2t": attn_t(blk.cross_i2t),
            "ln4": ln_t(blk.norm4),
        })

    masks, iou = S.decoder_apply(
        p, jnp.asarray(img_embed), jnp.asarray(img_pe), jnp.asarray(sparse), cfg
    )
    np.testing.assert_allclose(np.asarray(iou), iou_want.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(masks), masks_want.numpy(), atol=3e-5, rtol=1e-4)


def test_prompt_encoder_torch_golden_parity():
    """PromptEncoder parity: PositionEmbeddingRandom fourier features,
    box-corner embedding (+0.5 pixel offset, point_embeddings[2]/[3]),
    dense grid pe (cumsum-0.5 semantics)."""
    d = 16
    rs = np.random.RandomState(4)
    gaussian = rs.randn(2, d // 2).astype(np.float32)
    pe2 = rs.randn(d).astype(np.float32)
    pe3 = rs.randn(d).astype(np.float32)

    # torch-mirror math (official prompt_encoder.py PositionEmbeddingRandom)
    def t_pe(coords):
        c = 2 * coords - 1
        proj = c @ gaussian * (2 * np.pi)
        return np.concatenate([np.sin(proj), np.cos(proj)], axis=-1)

    img_size = 64
    box = np.asarray([[10.0, 20.0, 40.0, 50.0]], np.float32)
    corners = (box.reshape(1, 2, 2) + 0.5) / img_size
    want = t_pe(corners)
    want[:, 0] += pe2
    want[:, 1] += pe3

    from instructany2pix_tpu.grounding import sam as S

    p = {"pe_gaussian": jnp.asarray(gaussian),
         "point_embed_0": jnp.asarray(pe2), "point_embed_1": jnp.asarray(pe3)}
    got = S.encode_box(p, jnp.asarray(box), img_size)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)

    g = 4
    grid = np.ones((g, g), np.float32)
    y = grid.cumsum(0) - 0.5
    x = grid.cumsum(1) - 0.5
    want_pe = t_pe(np.stack([x / g, y / g], axis=-1))
    got_pe = S.dense_pe(p, g)
    np.testing.assert_allclose(np.asarray(got_pe), want_pe, atol=1e-5, rtol=1e-5)
