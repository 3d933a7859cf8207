"""MPT backbone golden parity vs the reference's vendored modules.

Oracle: the reference's own MPTBlock / build_attn_bias / LPLayerNorm
(reference llm/model/language_model/mpt/) driven directly — composed
like MPTModel.forward (wte → blocks → norm_f → tied logits). The
modeling_mpt.py module itself cannot import under transformers 4.57
(its hf_prefixlm_converter uses removed bloom internals), so the test
re-composes the forward from the importable pieces, mirroring
modeling_mpt.py:144-252.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from instructany2pix_tpu.models import mpt

sys.path.insert(0, "/root/reference/instructany2pix/llm/model/language_model")


def _torch_mpt_forward(sd, cfg, ids):
    import torch
    import torch.nn.functional as F

    from mpt.attention import attn_bias_shape, build_attn_bias
    from mpt.blocks import MPTBlock

    attn_config = {
        "attn_type": "multihead_attention", "attn_pdrop": 0.0,
        "attn_impl": "torch", "qk_ln": cfg.qk_ln, "clip_qkv": cfg.clip_qkv,
        "softmax_scale": cfg.softmax_scale, "prefix_lm": False,
        "attn_uses_sequence_id": False, "alibi": cfg.alibi,
        "alibi_bias_max": cfg.alibi_bias_max,
    }
    blocks = []
    for i in range(cfg.n_layers):
        blk = MPTBlock(
            d_model=cfg.d_model, n_heads=cfg.n_heads,
            expansion_ratio=cfg.expansion_ratio, attn_config=attn_config,
            norm_type="low_precision_layernorm",
        )
        if cfg.no_bias:
            for module in blk.modules():
                if hasattr(module, "bias") and isinstance(
                    module.bias, torch.nn.Parameter
                ):
                    module.register_parameter("bias", None)
        pre = f"transformer.blocks.{i}"
        state = {
            "norm_1.weight": sd[f"{pre}.norm_1.weight"],
            "attn.Wqkv.weight": sd[f"{pre}.attn.Wqkv.weight"],
            "attn.out_proj.weight": sd[f"{pre}.attn.out_proj.weight"],
            "norm_2.weight": sd[f"{pre}.norm_2.weight"],
            "ffn.up_proj.weight": sd[f"{pre}.ffn.up_proj.weight"],
            "ffn.down_proj.weight": sd[f"{pre}.ffn.down_proj.weight"],
        }
        blk.load_state_dict(state, strict=True)
        blocks.append(blk)

    wte = sd["transformer.wte.weight"]
    x = F.embedding(ids, wte)
    shape = attn_bias_shape(
        "torch", cfg.n_heads, cfg.max_seq_len, cfg.alibi,
        prefix_lm=False, causal=True, use_sequence_id=False,
    )
    bias = build_attn_bias(
        "torch", torch.zeros(shape), cfg.n_heads, cfg.max_seq_len,
        causal=True, alibi=cfg.alibi, alibi_bias_max=cfg.alibi_bias_max,
    )
    with torch.no_grad():
        for blk in blocks:
            x, _, _ = blk(x, attn_bias=bias, is_causal=True)
        # norm_f (LPLayerNorm, no bias)
        x = F.layer_norm(x, (cfg.d_model,), sd["transformer.norm_f.weight"], None)
        logits = x @ wte.T
    return logits.numpy()


@pytest.fixture(scope="module")
def tiny_setup():
    import torch

    cfg = mpt.MPTConfig.tiny()
    gen = torch.Generator().manual_seed(0)
    d = cfg.d_model
    sd = {"transformer.wte.weight": torch.randn(cfg.vocab_size, d, generator=gen) * 0.05,
          "transformer.norm_f.weight": 1 + 0.1 * torch.randn(d, generator=gen)}
    for i in range(cfg.n_layers):
        pre = f"transformer.blocks.{i}"
        sd[f"{pre}.norm_1.weight"] = 1 + 0.1 * torch.randn(d, generator=gen)
        sd[f"{pre}.attn.Wqkv.weight"] = torch.randn(3 * d, d, generator=gen) * 0.1
        sd[f"{pre}.attn.out_proj.weight"] = torch.randn(d, d, generator=gen) * 0.1
        sd[f"{pre}.norm_2.weight"] = 1 + 0.1 * torch.randn(d, generator=gen)
        sd[f"{pre}.ffn.up_proj.weight"] = torch.randn(
            cfg.expansion_ratio * d, d, generator=gen) * 0.1
        sd[f"{pre}.ffn.down_proj.weight"] = torch.randn(
            d, cfg.expansion_ratio * d, generator=gen) * 0.1
    return cfg, sd


def test_alibi_slopes_and_bias_parity(tiny_setup):
    import torch

    from mpt.attention import build_alibi_bias as t_bias
    from mpt.attention import gen_slopes as t_slopes

    for h in (4, 6, 8):  # incl. non-power-of-two
        np.testing.assert_allclose(
            np.asarray(mpt.gen_slopes(h)),
            t_slopes(h).numpy().reshape(-1), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(mpt.build_alibi_bias(h, 16)),
            t_bias(h, 16).numpy(), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(mpt.build_alibi_bias(h, 16, full=True)),
            t_bias(h, 16, full=True).numpy(), rtol=1e-6,
        )


def test_full_forward_parity(tiny_setup):
    import torch

    cfg, sd = tiny_setup
    ids_np = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 12))
    want = _torch_mpt_forward(sd, cfg, torch.from_numpy(ids_np))
    params = mpt.convert_from_mpt({k: v.numpy() for k, v in sd.items()}, cfg)
    got = mpt.forward(params, cfg, input_ids=jnp.asarray(ids_np))["logits"]
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_converter_covers_every_param(tiny_setup):
    from instructany2pix_tpu.core import tree as tree_util

    cfg, sd = tiny_setup
    params = mpt.convert_from_mpt({k: v.numpy() for k, v in sd.items()}, cfg)
    ours = mpt.init(jax.random.key(0), cfg)
    got, want = tree_util.flatten(params), tree_util.flatten(ours)
    assert set(got) == set(want), (set(got) ^ set(want))
    for k in want:
        assert np.shape(got[k]) == np.shape(want[k]), k


def test_kv_cache_decode_matches_full(tiny_setup):
    cfg, sd = tiny_setup
    params = mpt.convert_from_mpt(
        {k: v.numpy() for k, v in sd.items()}, cfg
    )
    ids = jnp.asarray(np.random.RandomState(1).randint(0, cfg.vocab_size, (1, 9)))
    full = mpt.forward(params, cfg, input_ids=ids)["logits"]
    cache = mpt.init_cache(cfg, 1, 16)
    out = mpt.forward(params, cfg, input_ids=ids[:, :5], cache=cache)
    cache = out["cache"]
    logits = [out["logits"]]
    for t in range(5, 9):
        out = mpt.forward(params, cfg, input_ids=ids[:, t : t + 1], cache=cache)
        cache = out["cache"]
        logits.append(out["logits"])
    inc = jnp.concatenate(logits, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=2e-4, rtol=1e-3)


def test_config_options_run(tiny_setup):
    """qk_ln / clip_qkv / logit_scale / learned-pos (alibi off) /
    embedding_fraction all execute (reference configuration_mpt.py
    surface)."""
    import dataclasses

    cfg = dataclasses.replace(
        mpt.MPTConfig.tiny(), qk_ln=True, clip_qkv=6.0,
        logit_scale="inv_sqrt_d_model", alibi=False, no_bias=False,
        embedding_fraction=0.5,
    )
    params = mpt.init(jax.random.key(0), cfg)
    ids = jnp.asarray([[1, 2, 3]])
    out = mpt.forward(params, cfg, input_ids=ids)
    assert np.isfinite(np.asarray(out["logits"])).all()
