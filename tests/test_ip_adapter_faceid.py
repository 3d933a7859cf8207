"""IP-Adapter FaceID family (diffusion/ip_adapter_faceid.py) — the
reference's vendored identity adapters (reference
ip_adapter_faceid.py, attention_processor_faceid.py) rebuilt as param
transforms + a face-token projector. Torch golden parity for the
projector built from the public module definitions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instructany2pix_tpu.diffusion import ip_adapter_faceid as F
from instructany2pix_tpu.models import unet as unet_lib
from instructany2pix_tpu.models import unet_convert


def test_mlp_proj_shapes_and_plus(rng):
    cfg = F.FaceProjConfig.tiny()
    params = F.init(rng, cfg)
    ids = jax.random.normal(jax.random.key(1), (2, cfg.id_embeddings_dim))
    toks = F.apply(params, ids, cfg)
    assert toks.shape == (2, cfg.num_tokens, cfg.cross_attention_dim)

    cfgp = F.FaceProjConfig.tiny(plus=True)
    pp = F.init(rng, cfgp)
    clip = jax.random.normal(jax.random.key(2), (2, 9, cfgp.clip_embeddings_dim))
    toks_p = F.apply(pp, ids, cfgp, clip_embeds=clip)
    assert toks_p.shape == (2, cfgp.num_tokens, cfgp.cross_attention_dim)
    # shortcut residual (v2 checkpoints): x + s·out ≠ out
    toks_s = F.apply(pp, ids, cfgp, clip_embeds=clip, shortcut=True, scale=0.5)
    assert not np.allclose(np.asarray(toks_p), np.asarray(toks_s))


def test_get_image_embeds_uncond_projects_zeros(rng):
    cfg = F.FaceProjConfig.tiny()
    params = F.init(rng, cfg)
    ids = jax.random.normal(jax.random.key(1), (2, cfg.id_embeddings_dim))
    cond, uncond = F.get_image_embeds(params, cfg, ids)
    ref_uncond = F.apply(params, jnp.zeros_like(ids), cfg)
    np.testing.assert_array_equal(np.asarray(uncond), np.asarray(ref_uncond))
    assert not np.allclose(np.asarray(cond), np.asarray(uncond))


def test_attach_faceid_lora_zero_init_preserves_forward(rng):
    cfg = unet_lib.UNetConfig.tiny(with_ip=True)
    params = unet_lib.init(rng, cfg)
    lat = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(jax.random.key(3), (2, cfg.pooled_dim))
    tid = jnp.ones((2, 6))
    ip = jax.random.normal(jax.random.key(4), (2, 4, cfg.cross_attention_dim))
    kw = dict(pooled_text=pooled, time_ids=tid, ip_tokens=ip, ip_scale=0.5)
    t = jnp.zeros((2,), jnp.int32)
    a = unet_lib.apply(params, lat, t, ctx, cfg, **kw)
    lparams = F.attach_faceid_lora(params, jax.random.key(5), rank=4)
    assert "lora_a" in lparams["mid"]["attn"]["block_0"]["attn1"]["to_q"]
    b = unet_lib.apply(lparams, lat, t, ctx, cfg, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # non-zero lora_b must change the output (the adapters are live)
    lparams["mid"]["attn"]["block_0"]["attn1"]["to_q"]["lora_b"] = (
        jnp.ones_like(lparams["mid"]["attn"]["block_0"]["attn1"]["to_q"]["lora_b"])
    )
    c = unet_lib.apply(lparams, lat, t, ctx, cfg, **kw)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def _torch_face_proj(cfg, plus):
    """Hand-built torch modules per the public FaceID definitions
    (MLP proj + optional FacePerceiverResampler)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    class PerceiverAttention(nn.Module):
        def __init__(self, dim, dim_head, heads):
            super().__init__()
            self.scale = dim_head**-0.5
            self.dim_head, self.heads = dim_head, heads
            inner = dim_head * heads
            self.norm1 = nn.LayerNorm(dim)
            self.norm2 = nn.LayerNorm(dim)
            self.to_q = nn.Linear(dim, inner, bias=False)
            self.to_kv = nn.Linear(dim, inner * 2, bias=False)
            self.to_out = nn.Linear(inner, dim, bias=False)

        def forward(self, x, latents):
            x = self.norm1(x)
            latents = self.norm2(latents)
            b, nl, _ = latents.shape
            q = self.to_q(latents)
            kv_in = torch.cat((x, latents), dim=-2)
            k, v = self.to_kv(kv_in).chunk(2, dim=-1)

            def hf(t):
                return t.reshape(b, t.shape[1], self.heads, -1).transpose(1, 2)

            q, k, v = hf(q), hf(k), hf(v)
            scale = 1 / (self.dim_head**0.5) ** 0.5
            w = (q * scale) @ (k * scale).transpose(-2, -1)
            w = torch.softmax(w.float(), dim=-1).type(w.dtype)
            out = w @ v
            out = out.transpose(1, 2).reshape(b, nl, -1)
            return self.to_out(out)

    class FF(nn.Module):
        def __init__(self, dim, mult):
            super().__init__()
            self.net = nn.Sequential(
                nn.LayerNorm(dim), nn.Linear(dim, dim * mult, bias=False),
                nn.GELU(), nn.Linear(dim * mult, dim, bias=False),
            )

        def forward(self, x):
            return self.net(x)

    class Proj(nn.Module):
        def __init__(self):
            super().__init__()
            ca, idd = cfg.cross_attention_dim, cfg.id_embeddings_dim
            self.proj = nn.Sequential(
                nn.Linear(idd, idd * 2), nn.GELU(),
                nn.Linear(idd * 2, ca * cfg.num_tokens),
            )
            self.norm = nn.LayerNorm(ca)
            if plus:
                self.proj_in = nn.Linear(cfg.clip_embeddings_dim, ca)
                self.proj_out = nn.Linear(ca, ca)
                self.norm_out = nn.LayerNorm(ca)
                self.layers = nn.ModuleList(
                    nn.ModuleList([
                        PerceiverAttention(ca, cfg.dim_head, cfg.heads),
                        FF(ca, cfg.ff_mult),
                    ]) for _ in range(cfg.depth)
                )

        def forward(self, ids, clip=None, shortcut=False, scale=1.0):
            x = self.proj(ids).reshape(-1, cfg.num_tokens, cfg.cross_attention_dim)
            x = self.norm(x)
            if not plus:
                return x
            h = self.proj_in(clip)
            latents = x
            for attn, ff in self.layers:
                latents = attn(h, latents) + latents
                latents = ff(latents) + latents
            out = self.norm_out(self.proj_out(latents))
            if shortcut:
                out = x + scale * out
            return out

    return Proj()


@pytest.mark.parametrize("plus", [False, True])
def test_face_proj_torch_golden_parity(plus):
    torch = pytest.importorskip("torch")
    cfg = F.FaceProjConfig.tiny(plus=plus)
    tm = _torch_face_proj(cfg, plus).eval()

    # torch state dict → reference checkpoint layout → our converter
    tsd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd = {"image_proj": {}, "ip_adapter": {}}
    for k, v in tsd.items():
        k2 = k
        if k.startswith("proj_in") or k.startswith("proj_out") or k.startswith("norm_out"):
            k2 = f"perceiver_resampler.{k}"
        elif k.startswith("layers."):
            i, rest = k.split(".", 2)[1], k.split(".", 2)[2]
            # torch nesting: layers.{i}.0 = attention, layers.{i}.1.net.{j} = FF
            rest = rest.replace("net.", "")
            k2 = f"perceiver_resampler.layers.{i}.{rest}"
        sd["image_proj"][k2] = jnp.asarray(v)

    ucfg = unet_lib.UNetConfig.tiny(with_ip=True)
    all_paths = unet_convert.all_attn_paths(ucfg)
    # synthesize a minimal lora half so the converter exercises it
    rs = np.random.RandomState(0)
    uparams = unet_lib.init(jax.random.key(7), ucfg)
    for i, path in enumerate(all_paths):
        node = uparams
        for part in path.split("."):
            node = node[part]
        for name in ("to_q", "to_k", "to_v", "to_out"):
            ind = node[name]["w"].shape[0]
            outd = node[name]["w"].shape[1]
            sd["ip_adapter"][f"{i}.{name}_lora.down.weight"] = jnp.asarray(
                rs.randn(2, ind).astype(np.float32))
            sd["ip_adapter"][f"{i}.{name}_lora.up.weight"] = jnp.asarray(
                rs.randn(outd, 2).astype(np.float32))
        if path.endswith("attn2"):
            d = node["to_q"]["w"].shape[1]
            sd["ip_adapter"][f"{i}.to_k_ip.weight"] = jnp.asarray(
                rs.randn(d, ucfg.cross_attention_dim).astype(np.float32))
            sd["ip_adapter"][f"{i}.to_v_ip.weight"] = jnp.asarray(
                rs.randn(d, ucfg.cross_attention_dim).astype(np.float32))

    proj, lora_tree = F.convert_faceid_from_torch(sd, cfg, all_paths)

    ids = np.random.RandomState(1).randn(2, cfg.id_embeddings_dim).astype(np.float32)
    clip = np.random.RandomState(2).randn(2, 9, cfg.clip_embeddings_dim).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(ids),
                  torch.from_numpy(clip) if plus else None).numpy()
    got = F.apply(proj, jnp.asarray(ids), cfg,
                  clip_embeds=jnp.asarray(clip) if plus else None)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)

    merged = F.merge_faceid_weights(uparams, lora_tree)
    sub = merged["mid"]["attn"]["block_0"]["attn1"]["to_q"]
    assert sub["lora_a"].shape[1] == 2 and sub["lora_b"].shape[0] == 2
    # LoRA math parity on one linear: y = xW + (x A) B · scale
    x = np.random.RandomState(3).randn(3, sub["w"].shape[0]).astype(np.float32)
    from instructany2pix_tpu.models import layers as L
    y = L.linear(sub, jnp.asarray(x))
    want_y = x @ np.asarray(sub["w"]) + (x @ np.asarray(sub["lora_a"])) @ np.asarray(sub["lora_b"])
    np.testing.assert_allclose(np.asarray(y), want_y, atol=1e-4, rtol=1e-4)
    # attn2 carries the face ip projections
    sub2 = merged["mid"]["attn"]["block_0"]["attn2"]
    assert "to_k_ip" in sub2 and sub2["to_k_ip"]["w"].shape[0] == ucfg.cross_attention_dim
