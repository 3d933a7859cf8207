"""Loader converters: prior model.bin layout, ip-adapter bin layout,
vision tower surface."""

import numpy as np
import jax
import jax.numpy as jnp

from instructany2pix_tpu.core import tree as tree_util
from instructany2pix_tpu.diffusion import ip_adapter as ipa
from instructany2pix_tpu import loaders
from instructany2pix_tpu.models import unet as unet_lib
from instructany2pix_tpu.models import unet_convert


def test_prior_loader_layout(tmp_path, rng):
    """Synthesize the reference ckpts/prior/model.bin key layout and
    check it converts into a tree our tiny prior can consume."""
    import torch
    from transformers import GPT2Config as HFCfg
    from transformers import GPT2Model

    from instructany2pix_tpu.prior import model as prior

    cfg = prior.PriorConfig.tiny()
    hf = GPT2Model(
        HFCfg(vocab_size=50, n_positions=cfg.gpt2.max_positions,
              n_embd=cfg.gpt2.hidden_size, n_layer=cfg.gpt2.num_layers,
              n_head=cfg.gpt2.num_heads)
    )
    sd = {f"model.{k}": v for k, v in hf.state_dict().items()}
    d = cfg.embed_dim
    sd["start_of_sequence_tokens.weight"] = torch.randn(32, d)
    sd["end_of_sequence_tokens.weight"] = torch.randn(32, d)
    sd["modality_embedding.weight"] = torch.randn(10, d)
    dims = {1: cfg.imagebind_dim, 2: cfg.text_dim, 3: cfg.score_dim}
    for i, dim in dims.items():
        sd[f"input_sequence_embed_linear.{i}.weight"] = torch.randn(d, dim)
        sd[f"input_sequence_embed_linear.{i}.bias"] = torch.randn(d)
    p = tmp_path / "model.bin"
    torch.save(sd, p)

    params = loaders.load_prior(str(p))
    # converted tree runs through the prior forward
    rs = np.random.RandomState(0)
    cond = {
        "src_type": jnp.full((1, 1), 3, jnp.int32),
        "imagebind": jnp.asarray(rs.randn(1, 1, cfg.imagebind_dim), jnp.float32),
        "crossattn_clip": (
            jnp.asarray(rs.randn(1, cfg.text_len, cfg.text_dim), jnp.float32),
            jnp.ones((1, cfg.text_len), jnp.float32),
        ),
        "score": jnp.asarray(rs.randn(1, 1, cfg.score_dim), jnp.float32),
    }
    out = prior.generate(params, cfg, cond)
    assert out.shape == (1, 1, cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_ip_adapter_loader_layout(rng):
    """ip_adapter_global_local_2_view.bin layout: image_proj.* +
    ip_adapter.{2i+1}.to_{k,v}_ip.weight in processor order."""
    cfg = unet_lib.UNetConfig.tiny(with_ip=True)
    paths = unet_convert.cross_attn_paths(cfg)
    ctx, dim = cfg.cross_attention_dim, 16
    proj_cfg = ipa.ImageProjConfig(cross_attention_dim=ctx, clip_embeddings_dim=dim)

    sd = {}
    sd["image_proj.proj.weight"] = np.random.randn(4 * ctx, dim).astype(np.float32)
    sd["image_proj.proj.bias"] = np.zeros(4 * ctx, np.float32)
    sd["image_proj.norm.weight"] = np.ones(ctx, np.float32)
    sd["image_proj.norm.bias"] = np.zeros(ctx, np.float32)
    sd["image_proj.raw_embed"] = np.zeros((2, ctx), np.float32)
    for i, path in enumerate(paths):
        # per-block hidden size: inner dim of the cross-attn at that path
        sd[f"ip_adapter.{2 * i + 1}.to_k_ip.weight"] = np.full(
            (_attn_dim(cfg, path), ctx), i, np.float32
        )
        sd[f"ip_adapter.{2 * i + 1}.to_v_ip.weight"] = np.full(
            (_attn_dim(cfg, path), ctx), -i, np.float32
        )

    image_proj_sd = {k[len("image_proj.") :]: v for k, v in sd.items() if k.startswith("image_proj.")}
    ip_sd = {k[len("ip_adapter.") :]: v for k, v in sd.items() if k.startswith("ip_adapter.")}
    proj = ipa.convert_image_proj_from_torch(image_proj_sd)
    assert proj["proj"]["w"].shape == (dim, 4 * ctx)
    attn = ipa.convert_ip_attn_from_torch(ip_sd, paths)
    # index i landed on path i (the processor-order contract)
    for i, path in enumerate(paths):
        assert float(attn[path]["to_k_ip"]["w"][0, 0]) == i

    # merged into the unet tree at the right leaves + still runs
    params = unet_lib.init(rng, cfg)
    merged = unet_convert.merge_ip_weights(params, attn)
    flat = tree_util.flatten(merged)
    assert f"{paths[0]}.to_k_ip.w" in flat
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    c = jax.random.normal(jax.random.key(2), (1, 5, ctx))
    pooled = jax.random.normal(jax.random.key(3), (1, cfg.pooled_dim))
    tid = jnp.asarray([[64, 64, 0, 0, 64, 64]], jnp.float32)
    ip_tok = jax.random.normal(jax.random.key(4), (1, 4, ctx))
    out = unet_lib.apply(
        merged, x, jnp.asarray([3]), c, cfg, pooled_text=pooled, time_ids=tid,
        ip_tokens=ip_tok, ip_scale=1.0,
    )
    assert np.isfinite(np.asarray(out)).all()


def _attn_dim(cfg, path):
    """Inner dim of the attention at a cross-attn param path."""
    blk = path.split(".")[0]
    if blk == "mid":
        return cfg.block_out_channels[-1]
    kind, idx = blk.split("_")
    ch = list(cfg.block_out_channels)
    return ch[int(idx)] if kind == "down" else list(reversed(ch))[int(idx)]


def test_vision_tower_select_features(rng):
    from instructany2pix_tpu.llm import vision_tower as vt

    cfg = vt.VisionTowerConfig.tiny()
    params = vt.init(rng, cfg)
    px = jax.random.normal(jax.random.key(1), (2, 28, 28, 3))
    patch = vt.apply(params, px, cfg)
    assert patch.shape[1] == (28 // 14) ** 2  # patches only
    cls_patch = vt.apply(params, px, vt.VisionTowerConfig(
        select_feature="cls_patch", clip=cfg.clip))
    assert cls_patch.shape[1] == patch.shape[1] + 1
    zeros = vt.apply(params, None, cfg, batch=3)
    assert zeros.shape[0] == 3 and float(jnp.abs(zeros).max()) == 0.0


def test_convert_checkpoints_cli_prior_roundtrip(tmp_path, rng):
    """scripts/convert_checkpoints.py: torch bin → orbax → restore
    round trip on the prior component (the one-time converter tool
    SURVEY.md §5.4 requires)."""
    import subprocess
    import sys
    import torch
    from transformers import GPT2Config as HFCfg
    from transformers import GPT2Model

    from instructany2pix_tpu.core import checkpoint as ckpt_lib
    from instructany2pix_tpu.prior import model as prior

    cfg = prior.PriorConfig.tiny()
    hf = GPT2Model(
        HFCfg(vocab_size=50, n_positions=cfg.gpt2.max_positions,
              n_embd=cfg.gpt2.hidden_size, n_layer=cfg.gpt2.num_layers,
              n_head=cfg.gpt2.num_heads)
    )
    sd = {f"model.{k}": v for k, v in hf.state_dict().items()}
    d = cfg.embed_dim
    sd["start_of_sequence_tokens.weight"] = torch.randn(32, d)
    sd["end_of_sequence_tokens.weight"] = torch.randn(32, d)
    sd["modality_embedding.weight"] = torch.randn(10, d)
    dims = {1: cfg.imagebind_dim, 2: cfg.text_dim, 3: cfg.score_dim}
    for i, dim in dims.items():
        sd[f"input_sequence_embed_linear.{i}.weight"] = torch.randn(d, dim)
        sd[f"input_sequence_embed_linear.{i}.bias"] = torch.randn(d)
    root = tmp_path / "ckpts"
    (root / "prior").mkdir(parents=True)
    torch.save(sd, root / "prior" / "model.bin")

    out = tmp_path / "orbax"
    import os as _os
    env = dict(_os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "scripts/convert_checkpoints.py",
         "--ckpt", str(root), "--out", str(out), "--only", "prior"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ref = loaders.load_prior(str(root / "prior" / "model.bin"))
    got = ckpt_lib.restore(str(out / "prior"))
    leaf_ref = np.asarray(jax.tree.leaves(ref)[0])
    leaf_got = np.asarray(jax.tree.leaves(got)[0])
    np.testing.assert_allclose(leaf_got, leaf_ref, atol=1e-6)
