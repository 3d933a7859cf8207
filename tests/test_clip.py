"""CLIP parity vs HuggingFace transformers (torch CPU) via the weight
converter — validates both the model math and the import pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instructany2pix_tpu.models import clip as clip_lib


def _tiny_hf_text():
    import torch
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModelWithProjection

    torch.manual_seed(0)
    hf_cfg = HFCfg(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        projection_dim=16,
        eos_token_id=127,
        bos_token_id=126,
        hidden_act="quick_gelu",
    )
    model = CLIPTextModelWithProjection(hf_cfg).eval()
    return model, hf_cfg


def test_text_parity_with_hf(rng):
    import torch

    model, hf_cfg = _tiny_hf_text()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = clip_lib.convert_text_from_hf(sd)
    cfg = clip_lib.CLIPTextConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        max_positions=16,
        projection_dim=16,
        eos_token_id=127,
    )
    ids = np.array([[126, 5, 9, 20, 127, 0, 0, 0], [126, 77, 127, 0, 0, 0, 0, 0]])
    with torch.no_grad():
        hf_out = model(
            input_ids=torch.tensor(ids), output_hidden_states=True
        )
    out = clip_lib.text_apply(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        hf_out.last_hidden_state.numpy(),
        atol=2e-5,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["text_embeds"]),
        hf_out.text_embeds.numpy(),
        atol=2e-5,
        rtol=1e-4,
    )
    # penultimate hidden state — what SDXL/the prior consume
    np.testing.assert_allclose(
        np.asarray(out["hidden_states"][-2]),
        hf_out.hidden_states[-2].numpy(),
        atol=2e-5,
        rtol=1e-4,
    )


def test_vision_parity_with_hf(rng):
    import torch
    from transformers import CLIPVisionConfig as HFVCfg
    from transformers import CLIPVisionModelWithProjection

    torch.manual_seed(0)
    hf_cfg = HFVCfg(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
        projection_dim=16,
        hidden_act="quick_gelu",
    )
    model = CLIPVisionModelWithProjection(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = clip_lib.convert_vision_from_hf(sd)
    cfg = clip_lib.CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        image_size=28,
        patch_size=14,
        projection_dim=16,
        hidden_act="quick_gelu",
    )
    px = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        hf_out = model(pixel_values=torch.tensor(px))
    out = clip_lib.vision_apply(
        params, jnp.asarray(px.transpose(0, 2, 3, 1)), cfg
    )
    np.testing.assert_allclose(
        np.asarray(out["image_embeds"]),
        hf_out.image_embeds.numpy(),
        atol=2e-5,
        rtol=1e-4,
    )
