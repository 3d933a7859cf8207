"""Golden numeric parity vs hand-built torch re-implementations of the
diffusers conventions (SURVEY.md §4 recommended strategy; VERDICT r1
item 10). diffusers itself is not installed, so the torch side is a
functional interpreter over a diffusers-named state dict implementing
the documented SDXL UNet semantics: ResnetBlock2D (GN eps 1e-5 → SiLU →
conv → +time proj → GN → SiLU → conv → +shortcut), Transformer2DModel
(GN eps 1e-6, linear proj, LN/self-attn/cross-attn/GEGLU), sinusoidal
time embedding with flip_sin_to_cos, text_time added conditioning,
stride-2 pad-1 downsample, nearest ×2 upsample. The same state dict
flows through `unet_convert.convert_unet` into `unet.apply` — outputs
must match to float32 tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instructany2pix_tpu.models import unet as unet_lib
from instructany2pix_tpu.models import unet_convert

torch = pytest.importorskip("torch")
F = torch.nn.functional


# ------------------------------------------------ torch-side primitives


def t_timestep_embedding(t, dim, downscale_freq_shift=0.0, flip_sin_to_cos=True):
    half = dim // 2
    exponent = -np.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


def t_gn(sd, p, x, groups, eps):
    return F.group_norm(x, groups, sd[f"{p}.weight"], sd[f"{p}.bias"], eps)


def t_conv(sd, p, x, stride=1, padding=1):
    return F.conv2d(x, sd[f"{p}.weight"], sd[f"{p}.bias"], stride, padding)


def t_lin(sd, p, x, bias=True):
    return F.linear(x, sd[f"{p}.weight"], sd.get(f"{p}.bias") if bias else None)


def t_resnet(sd, p, x, temb, groups):
    h = F.silu(t_gn(sd, f"{p}.norm1", x, groups, 1e-5))
    h = t_conv(sd, f"{p}.conv1", h)
    h = h + t_lin(sd, f"{p}.time_emb_proj", F.silu(temb))[:, :, None, None]
    h = F.silu(t_gn(sd, f"{p}.norm2", h, groups, 1e-5))
    h = t_conv(sd, f"{p}.conv2", h)
    if f"{p}.conv_shortcut.weight" in sd:
        x = t_conv(sd, f"{p}.conv_shortcut", x, padding=0)
    return x + h


def t_mha(sd, p, x, ctx, heads):
    b, s, d = x.shape
    hd = d // heads
    q = t_lin(sd, f"{p}.to_q", x, bias=False).view(b, s, heads, hd).transpose(1, 2)
    k = t_lin(sd, f"{p}.to_k", ctx, bias=False).view(b, -1, heads, hd).transpose(1, 2)
    v = t_lin(sd, f"{p}.to_v", ctx, bias=False).view(b, -1, heads, hd).transpose(1, 2)
    a = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd), dim=-1)
    o = (a @ v).transpose(1, 2).reshape(b, s, d)
    return t_lin(sd, f"{p}.to_out.0", o)


def t_transformer(sd, p, x, ctx, heads, depth, groups):
    b, c, hh, ww = x.shape
    res = x
    h = t_gn(sd, f"{p}.norm", x, groups, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    h = t_lin(sd, f"{p}.proj_in", h)
    for i in range(depth):
        tb = f"{p}.transformer_blocks.{i}"
        n = F.layer_norm(h, (c,), sd[f"{tb}.norm1.weight"], sd[f"{tb}.norm1.bias"])
        h = h + t_mha(sd, f"{tb}.attn1", n, n, heads)
        n = F.layer_norm(h, (c,), sd[f"{tb}.norm2.weight"], sd[f"{tb}.norm2.bias"])
        h = h + t_mha(sd, f"{tb}.attn2", n, ctx, heads)
        n = F.layer_norm(h, (c,), sd[f"{tb}.norm3.weight"], sd[f"{tb}.norm3.bias"])
        ff = t_lin(sd, f"{tb}.ff.net.0.proj", n)
        a, g = ff.chunk(2, dim=-1)
        h = h + t_lin(sd, f"{tb}.ff.net.2", a * F.gelu(g))
    h = t_lin(sd, f"{p}.proj_out", h)
    h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    return h + res


def t_unet_forward(sd, cfg, sample, t, ctx, pooled, time_ids):
    g = cfg.norm_num_groups
    b = sample.shape[0]
    temb = t_timestep_embedding(t, cfg.block_out_channels[0])
    temb = t_lin(sd, "time_embedding.linear_2",
                 F.silu(t_lin(sd, "time_embedding.linear_1", temb)))
    tid = t_timestep_embedding(time_ids.reshape(-1), cfg.addition_time_embed_dim)
    add = torch.cat([pooled, tid.reshape(b, -1)], dim=-1)
    temb = temb + t_lin(sd, "add_embedding.linear_2",
                        F.silu(t_lin(sd, "add_embedding.linear_1", add)))

    h = t_conv(sd, "conv_in", sample)
    skips = [h]
    for i, btype in enumerate(cfg.down_block_types):
        for j in range(cfg.layers_per_block):
            h = t_resnet(sd, f"down_blocks.{i}.resnets.{j}", h, temb, g)
            if btype == "CrossAttnDownBlock2D":
                h = t_transformer(
                    sd, f"down_blocks.{i}.attentions.{j}", h, ctx,
                    cfg.num_attention_heads[i],
                    cfg.transformer_layers_per_block[i], g,
                )
            skips.append(h)
        if i < len(cfg.block_out_channels) - 1:
            h = t_conv(sd, f"down_blocks.{i}.downsamplers.0.conv", h, stride=2)
            skips.append(h)

    h = t_resnet(sd, "mid_block.resnets.0", h, temb, g)
    h = t_transformer(
        sd, "mid_block.attentions.0", h, ctx, cfg.num_attention_heads[-1],
        cfg.transformer_layers_per_block[-1], g,
    )
    h = t_resnet(sd, "mid_block.resnets.1", h, temb, g)

    rev_types = list(reversed(cfg.down_block_types))
    rev_heads = list(reversed(cfg.num_attention_heads))
    rev_depth = list(reversed(cfg.transformer_layers_per_block))
    for i, btype in enumerate(rev_types):
        for j in range(cfg.layers_per_block + 1):
            h = torch.cat([h, skips.pop()], dim=1)
            h = t_resnet(sd, f"up_blocks.{i}.resnets.{j}", h, temb, g)
            if btype == "CrossAttnDownBlock2D":
                h = t_transformer(
                    sd, f"up_blocks.{i}.attentions.{j}", h, ctx,
                    rev_heads[i], rev_depth[i], g,
                )
        if i < len(cfg.block_out_channels) - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = t_conv(sd, f"up_blocks.{i}.upsamplers.0.conv", h)

    h = F.silu(t_gn(sd, "conv_norm_out", h, g, 1e-5))
    return t_conv(sd, "conv_out", h)


# ------------------------------------------------ state-dict generation


def _make_unet_state_dict(cfg, seed=0):
    """Random diffusers-named SDXL UNet state dict for `cfg`."""
    gen = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(p, cin, cout, bias=True):
        sd[f"{p}.weight"] = torch.randn(cout, cin, generator=gen) * 0.2
        if bias:
            sd[f"{p}.bias"] = torch.randn(cout, generator=gen) * 0.1

    def conv(p, cin, cout, k):
        sd[f"{p}.weight"] = torch.randn(cout, cin, k, k, generator=gen) * 0.2
        sd[f"{p}.bias"] = torch.randn(cout, generator=gen) * 0.1

    def norm(p, c):
        sd[f"{p}.weight"] = 1 + 0.1 * torch.randn(c, generator=gen)
        sd[f"{p}.bias"] = 0.1 * torch.randn(c, generator=gen)

    def resnet(p, cin, cout, ted):
        norm(f"{p}.norm1", cin)
        conv(f"{p}.conv1", cin, cout, 3)
        lin(f"{p}.time_emb_proj", ted, cout)
        norm(f"{p}.norm2", cout)
        conv(f"{p}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{p}.conv_shortcut", cin, cout, 1)

    def transformer(p, c, ctx_dim, depth):
        norm(f"{p}.norm", c)
        lin(f"{p}.proj_in", c, c)
        lin(f"{p}.proj_out", c, c)
        for i in range(depth):
            tb = f"{p}.transformer_blocks.{i}"
            for n in ("norm1", "norm2", "norm3"):
                sd[f"{tb}.{n}.weight"] = 1 + 0.1 * torch.randn(c, generator=gen)
                sd[f"{tb}.{n}.bias"] = 0.1 * torch.randn(c, generator=gen)
            for attn, kdim in (("attn1", c), ("attn2", ctx_dim)):
                lin(f"{tb}.{attn}.to_q", c, c, bias=False)
                lin(f"{tb}.{attn}.to_k", kdim, c, bias=False)
                lin(f"{tb}.{attn}.to_v", kdim, c, bias=False)
                lin(f"{tb}.{attn}.to_out.0", c, c)
            lin(f"{tb}.ff.net.0.proj", c, c * 8)
            lin(f"{tb}.ff.net.2", c * 4, c)

    ch = cfg.block_out_channels
    ted = cfg.time_embed_dim
    conv("conv_in", cfg.in_channels, ch[0], 3)
    lin("time_embedding.linear_1", ch[0], ted)
    lin("time_embedding.linear_2", ted, ted)
    lin("add_embedding.linear_1", cfg.projection_class_embeddings_input_dim, ted)
    lin("add_embedding.linear_2", ted, ted)

    skip_ch = [ch[0]]
    cin = ch[0]
    for i, btype in enumerate(cfg.down_block_types):
        cout = ch[i]
        for j in range(cfg.layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", cin if j == 0 else cout, cout, ted)
            if btype == "CrossAttnDownBlock2D":
                transformer(f"down_blocks.{i}.attentions.{j}", cout,
                            cfg.cross_attention_dim,
                            cfg.transformer_layers_per_block[i])
            skip_ch.append(cout)
        if i < len(ch) - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", cout, cout, 3)
            skip_ch.append(cout)
        cin = cout

    resnet("mid_block.resnets.0", cin, cin, ted)
    transformer("mid_block.attentions.0", cin, cfg.cross_attention_dim,
                cfg.transformer_layers_per_block[-1])
    resnet("mid_block.resnets.1", cin, cin, ted)

    rev_ch = list(reversed(ch))
    rev_types = list(reversed(cfg.down_block_types))
    for i, btype in enumerate(rev_types):
        cout = rev_ch[i]
        for j in range(cfg.layers_per_block + 1):
            res_skip = skip_ch.pop()
            resnet(f"up_blocks.{i}.resnets.{j}",
                   (cin if j == 0 else cout) + res_skip, cout, ted)
            if btype == "CrossAttnDownBlock2D":
                transformer(f"up_blocks.{i}.attentions.{j}", cout,
                            cfg.cross_attention_dim,
                            list(reversed(cfg.transformer_layers_per_block))[i])
        if i < len(ch) - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", cout, cout, 3)
        cin = cout

    norm("conv_norm_out", ch[0])
    conv("conv_out", ch[0], cfg.out_channels, 3)
    return sd


# ----------------------------------------------------------------- test


class TestUNetGoldenParity:
    def test_full_forward_matches_torch(self):
        cfg = unet_lib.UNetConfig.tiny(with_ip=False)
        sd = _make_unet_state_dict(cfg, seed=0)
        params = unet_convert.convert_unet(
            {k: v.numpy() for k, v in sd.items()}
        )

        rs = np.random.RandomState(0)
        b, hw = 2, 16
        sample = rs.randn(b, hw, hw, cfg.in_channels).astype(np.float32)
        t = np.asarray([3, 500], np.int64)
        ctx = rs.randn(b, 7, cfg.cross_attention_dim).astype(np.float32)
        pooled = rs.randn(b, cfg.pooled_dim).astype(np.float32)
        tid = np.asarray([[64, 64, 0, 0, 64, 64]] * b, np.float32)

        with torch.no_grad():
            ref = t_unet_forward(
                sd, cfg, torch.from_numpy(sample.transpose(0, 3, 1, 2)),
                torch.from_numpy(t), torch.from_numpy(ctx),
                torch.from_numpy(pooled), torch.from_numpy(tid),
            ).numpy().transpose(0, 2, 3, 1)

        got = np.asarray(
            unet_lib.apply(
                params, jnp.asarray(sample), jnp.asarray(t), jnp.asarray(ctx),
                cfg, pooled_text=jnp.asarray(pooled), time_ids=jnp.asarray(tid),
            )
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)

    def test_timestep_embedding_matches(self):
        from instructany2pix_tpu.models import layers as L

        t = np.asarray([0, 1, 7, 999], np.float32)
        for dim in (8, 32):
            ref = t_timestep_embedding(torch.from_numpy(t), dim).numpy()
            got = np.asarray(
                L.timestep_embedding(jnp.asarray(t), dim, flip_sin_to_cos=True,
                                     downscale_freq_shift=0.0)
            )
            np.testing.assert_allclose(got, ref, atol=1e-5)


# -------------------------------------------------------------- VAE side


def t_vae_resnet(sd, p, x, groups):
    h = F.silu(t_gn(sd, f"{p}.norm1", x, groups, 1e-6))
    h = t_conv(sd, f"{p}.conv1", h)
    h = F.silu(t_gn(sd, f"{p}.norm2", h, groups, 1e-6))
    h = t_conv(sd, f"{p}.conv2", h)
    if f"{p}.conv_shortcut.weight" in sd:
        x = t_conv(sd, f"{p}.conv_shortcut", x, padding=0)
    return x + h


def t_vae_attn(sd, p, x, groups):
    b, c, hh, ww = x.shape
    y = t_gn(sd, f"{p}.group_norm", x, groups, 1e-6)
    y = y.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    q = t_lin(sd, f"{p}.to_q", y)
    k = t_lin(sd, f"{p}.to_k", y)
    v = t_lin(sd, f"{p}.to_v", y)
    a = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(c), dim=-1)
    o = t_lin(sd, f"{p}.to_out.0", a @ v)
    return x + o.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


def t_vae_encode_moments(sd, cfg, x):
    g = cfg.norm_num_groups
    h = t_conv(sd, "encoder.conv_in", x)
    for i in range(len(cfg.block_out_channels)):
        for j in range(cfg.layers_per_block):
            h = t_vae_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", h, g)
        if i < len(cfg.block_out_channels) - 1:
            h = F.pad(h, (0, 1, 0, 1))
            h = t_conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", h,
                       stride=2, padding=0)
    h = t_vae_resnet(sd, "encoder.mid_block.resnets.0", h, g)
    h = t_vae_attn(sd, "encoder.mid_block.attentions.0", h, g)
    h = t_vae_resnet(sd, "encoder.mid_block.resnets.1", h, g)
    h = F.silu(t_gn(sd, "encoder.conv_norm_out", h, g, 1e-6))
    h = t_conv(sd, "encoder.conv_out", h)
    h = t_conv(sd, "quant_conv", h, padding=0)
    mean, logvar = h.chunk(2, dim=1)
    return mean, torch.clamp(logvar, -30.0, 20.0)


def t_vae_decode(sd, cfg, z):
    g = cfg.norm_num_groups
    h = z / cfg.scaling_factor
    h = t_conv(sd, "post_quant_conv", h, padding=0)
    h = t_conv(sd, "decoder.conv_in", h)
    h = t_vae_resnet(sd, "decoder.mid_block.resnets.0", h, g)
    h = t_vae_attn(sd, "decoder.mid_block.attentions.0", h, g)
    h = t_vae_resnet(sd, "decoder.mid_block.resnets.1", h, g)
    for i in range(len(cfg.block_out_channels)):
        for j in range(cfg.layers_per_block + 1):
            h = t_vae_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", h, g)
        if i < len(cfg.block_out_channels) - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = t_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", h)
    h = F.silu(t_gn(sd, "decoder.conv_norm_out", h, g, 1e-6))
    return t_conv(sd, "decoder.conv_out", h)


def _make_vae_state_dict(cfg, seed=0):
    gen = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(p, cin, cout):
        sd[f"{p}.weight"] = torch.randn(cout, cin, generator=gen) * 0.2
        sd[f"{p}.bias"] = torch.randn(cout, generator=gen) * 0.1

    def conv(p, cin, cout, k):
        sd[f"{p}.weight"] = torch.randn(cout, cin, k, k, generator=gen) * 0.2
        sd[f"{p}.bias"] = torch.randn(cout, generator=gen) * 0.1

    def norm(p, c):
        sd[f"{p}.weight"] = 1 + 0.1 * torch.randn(c, generator=gen)
        sd[f"{p}.bias"] = 0.1 * torch.randn(c, generator=gen)

    def resnet(p, cin, cout):
        norm(f"{p}.norm1", cin)
        conv(f"{p}.conv1", cin, cout, 3)
        norm(f"{p}.norm2", cout)
        conv(f"{p}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{p}.conv_shortcut", cin, cout, 1)

    def attn(p, c):
        norm(f"{p}.group_norm", c)
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{p}.{n}", c, c)
        lin(f"{p}.to_out.0", c, c)

    ch = cfg.block_out_channels
    conv("encoder.conv_in", cfg.in_channels, ch[0], 3)
    cin = ch[0]
    for i, cout in enumerate(ch):
        c = cin
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", c, cout)
            c = cout
        if i < len(ch) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", cout, cout, 3)
        cin = cout
    resnet("encoder.mid_block.resnets.0", cin, cin)
    attn("encoder.mid_block.attentions.0", cin)
    resnet("encoder.mid_block.resnets.1", cin, cin)
    norm("encoder.conv_norm_out", cin)
    conv("encoder.conv_out", cin, 2 * cfg.latent_channels, 3)
    conv("quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)

    conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels, 1)
    conv("decoder.conv_in", cfg.latent_channels, ch[-1], 3)
    cin = ch[-1]
    resnet("decoder.mid_block.resnets.0", cin, cin)
    attn("decoder.mid_block.attentions.0", cin)
    resnet("decoder.mid_block.resnets.1", cin, cin)
    for i, cout in enumerate(reversed(ch)):
        c = cin
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", c, cout)
            c = cout
        if i < len(ch) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", cout, cout, 3)
        cin = cout
    norm("decoder.conv_norm_out", cin)
    conv("decoder.conv_out", cin, cfg.in_channels, 3)
    return sd


class TestVAEGoldenParity:
    def test_encode_decode_match_torch(self):
        from instructany2pix_tpu.models import vae as vae_lib

        cfg = vae_lib.VAEConfig.tiny()
        sd = _make_vae_state_dict(cfg, seed=0)
        params = unet_convert.convert_vae({k: v.numpy() for k, v in sd.items()})

        rs = np.random.RandomState(0)
        x = rs.randn(2, 16, 16, 3).astype(np.float32)
        with torch.no_grad():
            mean_t, logvar_t = t_vae_encode_moments(
                sd, cfg, torch.from_numpy(x.transpose(0, 3, 1, 2))
            )
        mean_j, logvar_j = vae_lib.encode_moments(params, jnp.asarray(x), cfg)
        np.testing.assert_allclose(
            np.asarray(mean_j), mean_t.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(logvar_j), logvar_t.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=2e-3,
        )

        z = rs.randn(2, 4, 4, cfg.latent_channels).astype(np.float32)
        with torch.no_grad():
            dec_t = t_vae_decode(
                sd, cfg, torch.from_numpy(z.transpose(0, 3, 1, 2))
            ).numpy().transpose(0, 2, 3, 1)
        dec_j = np.asarray(vae_lib.decode(params, jnp.asarray(z), cfg))
        np.testing.assert_allclose(dec_j, dec_t, atol=2e-4, rtol=2e-3)
