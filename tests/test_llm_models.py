"""Llama + GPT-2 parity vs HF transformers, and KV-cache consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.models import gpt2 as gpt2_lib
from instructany2pix_tpu.models import llama as llama_lib


def _tiny_hf_llama():
    import torch
    from transformers import LlamaConfig as HFCfg
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    cfg = HFCfg(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
        # 1e-6 = the HF default Vicuna-7B ships; the jax LlamaConfig
        # matches it (the composed golden caught the old 1e-5 mismatch)
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    return LlamaForCausalLM(cfg).eval()


def test_llama_parity_with_hf(rng):
    import torch

    model = _tiny_hf_llama()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = llama_lib.convert_from_hf(sd)
    cfg = llama_lib.LlamaConfig.tiny()
    ids = np.array([[1, 5, 9, 20, 33, 2, 17, 90]])
    with torch.no_grad():
        hf = model(torch.tensor(ids), output_hidden_states=True)
    out = llama_lib.forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(out["logits"]), hf.logits.numpy(), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["hidden_norm"]),
        hf.hidden_states[-1].numpy(),
        atol=3e-5,
        rtol=1e-4,
    )


def test_llama_kv_cache_matches_full_forward(rng):
    cfg = llama_lib.LlamaConfig.tiny()
    params = llama_lib.init(rng, cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 12)))

    full = llama_lib.forward(params, cfg, input_ids=ids)

    # prefill 8 tokens, then decode 4 one at a time
    cache = llama_lib.KVCache.create(cfg, batch=2, max_len=32, dtype=jnp.float32)
    out = llama_lib.forward(params, cfg, input_ids=ids[:, :8], cache=cache)
    cache = out["cache"]
    logits_inc = [out["logits"]]
    for i in range(8, 12):
        out = llama_lib.forward(params, cfg, input_ids=ids[:, i : i + 1], cache=cache)
        cache = out["cache"]
        logits_inc.append(out["logits"])
    logits_inc = jnp.concatenate(logits_inc, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_inc), np.asarray(full["logits"]), atol=2e-4, rtol=1e-3
    )
    assert int(cache.length) == 12


def test_llama_inputs_embeds_splice_equivalence(rng):
    """Feeding embed(input_ids) as inputs_embeds must equal input_ids path —
    the contract the multimodal extra_replacement splice relies on."""
    cfg = llama_lib.LlamaConfig.tiny()
    params = llama_lib.init(rng, cfg)
    ids = jnp.asarray([[3, 14, 15, 92, 65]])
    a = llama_lib.forward(params, cfg, input_ids=ids)
    emb = llama_lib.embed(params, ids)
    b = llama_lib.forward(params, cfg, inputs_embeds=emb)
    np.testing.assert_allclose(
        np.asarray(a["logits"]), np.asarray(b["logits"]), atol=1e-6
    )


def test_gpt2_parity_with_hf(rng):
    import torch
    from transformers import GPT2Config as HFCfg
    from transformers import GPT2Model

    torch.manual_seed(0)
    hf_cfg = HFCfg(
        vocab_size=100,
        n_positions=64,
        n_embd=32,
        n_layer=2,
        n_head=4,
        activation_function="gelu_new",
        attn_pdrop=0.0,
        embd_pdrop=0.0,
        resid_pdrop=0.0,
    )
    model = GPT2Model(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = gpt2_lib.convert_from_hf(sd)
    cfg = gpt2_lib.GPT2Config.tiny()

    x = np.random.RandomState(0).randn(2, 10, 32).astype(np.float32)
    attn_mask = np.ones((2, 10), np.int64)
    attn_mask[1, 7:] = 0
    with torch.no_grad():
        hf = model(
            inputs_embeds=torch.tensor(x), attention_mask=torch.tensor(attn_mask)
        )
    out = gpt2_lib.forward(
        params, cfg, jnp.asarray(x), attention_mask=jnp.asarray(attn_mask)
    )
    # compare only unmasked positions (HF computes garbage at masked slots)
    np.testing.assert_allclose(
        np.asarray(out)[0], hf.last_hidden_state.numpy()[0], atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out)[1, :7], hf.last_hidden_state.numpy()[1, :7], atol=3e-5, rtol=1e-4
    )


def test_scan_layers_matches_unrolled(rng):
    """llama.stack_layers + the lax.scan forward path are bit-equivalent
    to the unrolled per-layer loop (train-path transform, PERF §2)."""
    import dataclasses

    from instructany2pix_tpu.models import llama

    cfg = dataclasses.replace(llama.LlamaConfig.tiny(), remat=False)
    params = llama.init(rng, cfg)
    ids = jnp.asarray([[1, 5, 9, 20, 7]])
    ref = llama.forward(params, cfg, input_ids=ids)
    stacked = llama.stack_layers(params, cfg)
    got = llama.forward(stacked, cfg, input_ids=ids)
    np.testing.assert_allclose(
        np.asarray(got["logits"]), np.asarray(ref["logits"]), atol=2e-5, rtol=1e-5
    )
    # remat variant also matches
    cfg_r = dataclasses.replace(cfg, remat=True, remat_policy="dots")
    got_r = llama.forward(stacked, cfg_r, input_ids=ids)
    np.testing.assert_allclose(
        np.asarray(got_r["logits"]), np.asarray(ref["logits"]), atol=2e-5, rtol=1e-5
    )
    # round trip
    back = llama.unstack_layers(stacked, cfg)
    ref2 = llama.forward(back, cfg, input_ids=ids)
    np.testing.assert_array_equal(np.asarray(ref2["logits"]), np.asarray(ref["logits"]))


def test_scan_layers_train_step_on_mesh(rng, mesh8):
    """Stacked-layer multimodal train step runs sharded end-to-end."""
    import jax as _jax

    from instructany2pix_tpu.llm import constants as C
    from instructany2pix_tpu.llm import multimodal as mm
    from instructany2pix_tpu.models import llama
    from instructany2pix_tpu.parallel import sharding as sh
    from instructany2pix_tpu.train.train_step import TrainConfig, make_train_step

    cfg = mm.Any2PixLMConfig.tiny()
    params = mm.init(rng, cfg)
    params["llama"] = llama.stack_layers(params["llama"], cfg.llama)
    init_state, train_step = make_train_step(cfg, TrainConfig(total_steps=4), mesh=mesh8)
    with _jax.set_mesh(mesh8):
        state = init_state(params)
        b, s = 8, 16
        rs = np.random.RandomState(0)
        ids = rs.randint(3, 250, (b, s))
        ids[:, 5] = cfg.im_gen_token_id
        labels = ids.copy()
        batch = {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(labels),
            "attention_mask": jnp.ones((b, s), bool),
            "replacement_data": jnp.asarray(rs.randn(b, s, cfg.image_codec_dim), jnp.float32),
            "replacement_type": jnp.asarray(np.full((b, s), -1)),
            "gen_target_image": jnp.asarray(rs.randn(b, s, cfg.image_codec_dim), jnp.float32),
            "gen_mask_image": jnp.asarray(ids == cfg.im_gen_token_id),
        }
        batch = {
            k: _jax.device_put(
                v, _jax.sharding.NamedSharding(mesh8, sh.batch_spec(getattr(v, "ndim", 1)))
            ) for k, v in batch.items()
        }
        state, metrics = train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
