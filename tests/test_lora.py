"""LoRA: zero-init equivalence, adapter training mask, merge."""

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.core import tree as tree_util
from instructany2pix_tpu.models import llama
from instructany2pix_tpu.train import lora


def test_lora_zero_init_preserves_forward(rng):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init(rng, cfg)
    ids = jnp.asarray([[1, 5, 9, 20]])
    base = llama.forward(params, cfg, input_ids=ids)["logits"]
    lparams = lora.apply_lora(params, jax.random.key(1), rank=4)
    out = llama.forward(lparams, cfg, input_ids=ids)["logits"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)
    # factors actually attached
    flat = tree_util.flatten(lparams)
    assert any(k.endswith("lora_a") for k in flat)


def test_lora_changes_forward_after_update(rng):
    cfg = llama.LlamaConfig.tiny()
    params = lora.apply_lora(llama.init(rng, cfg), jax.random.key(1), rank=4)
    flat = tree_util.flatten(params)
    k = next(k for k in flat if k.endswith("lora_b"))
    flat[k] = jnp.ones_like(flat[k]) * 0.1
    params2 = tree_util.unflatten(flat)
    ids = jnp.asarray([[1, 5, 9]])
    a = llama.forward(params, cfg, input_ids=ids)["logits"]
    b = llama.forward(params2, cfg, input_ids=ids)["logits"]
    assert float(jnp.abs(a - b).max()) > 1e-4
    # merge reproduces the adapted forward with plain weights
    merged = lora.merge_lora(params2)
    flatm = tree_util.flatten(merged)
    assert not any("lora" in kk for kk in flatm)
    c = llama.forward(merged, cfg, input_ids=ids)["logits"]
    np.testing.assert_allclose(np.asarray(c), np.asarray(b), atol=1e-5)


def test_trainable_mask_targets_adapters_and_heads(rng):
    from instructany2pix_tpu.llm import multimodal as mm

    cfg = mm.Any2PixLMConfig.tiny()
    params = mm.init(rng, cfg)
    params["llama"] = lora.apply_lora(params["llama"], jax.random.key(1))
    mask = lora.trainable_mask(params)
    flat_m = tree_util.flatten(mask)
    assert flat_m["vae_predictor_image.fc1.w"] is True
    assert flat_m["llama.layer_0.q.lora_a"] is True
    assert flat_m["llama.layer_0.q.w"] is False
    assert flat_m["llama.embed_tokens.w"] is False


def test_split_lora_state(rng):
    cfg = llama.LlamaConfig.tiny()
    params = lora.apply_lora(llama.init(rng, cfg), jax.random.key(1), rank=4)
    adapters = lora.split_lora_state(params)
    flat = tree_util.flatten(adapters)
    assert flat and all("lora" in k.split(".")[-1] for k in flat)
