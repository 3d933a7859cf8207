"""GroundingDINO stack: Swin, BERT (HF parity), deformable attention,
end-to-end grounder."""

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.grounding import bert as bert_lib
from instructany2pix_tpu.grounding import gdino as gdino_lib
from instructany2pix_tpu.grounding import swin as swin_lib


def test_swin_multiscale_shapes(rng):
    cfg = swin_lib.SwinConfig.tiny()
    params = swin_lib.init(rng, cfg)
    x = jax.random.normal(jax.random.key(1), (1, 32, 48, 3))
    feats = swin_lib.apply(params, x, cfg)
    # patch 4 → stage0 8x12; out stages 1,2 → 4x6 (2C) and 2x3 (4C)
    assert feats[0].shape == (1, 4, 6, 16)
    assert feats[1].shape == (1, 2, 3, 32)
    for f in feats:
        assert np.all(np.isfinite(np.asarray(f)))


def test_bert_parity_with_hf(rng):
    import torch
    from transformers import BertConfig as HFCfg
    from transformers import BertModel

    torch.manual_seed(0)
    hf = BertModel(
        HFCfg(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=32, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
    ).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = bert_lib.convert_from_hf(sd)
    cfg = bert_lib.BertConfig.tiny()
    ids = np.array([[2, 5, 9, 20, 3, 0, 0]])
    mask = np.array([[1, 1, 1, 1, 1, 0, 0]])
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
    out = bert_lib.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out)[0, :5], ref.last_hidden_state.numpy()[0, :5],
        atol=3e-5, rtol=1e-4,
    )


def test_deformable_attention_center_sampling(rng):
    """Zero offsets + reference point at a token center must reproduce
    (a weighted view of) that token's value — pins the bilinear gather
    coordinate convention."""
    d, heads, points = 8, 2, 1
    kc_key = jax.random.key(0)
    p = gdino_lib._deform_init(gdino_lib.KeyChain(kc_key), d, heads, 1, points)
    # force offsets to exactly zero and identity-ish projections
    p["sampling_offsets"]["w"] = jnp.zeros_like(p["sampling_offsets"]["w"])
    p["sampling_offsets"]["b"] = jnp.zeros_like(p["sampling_offsets"]["b"])
    p["value_proj"]["w"] = jnp.eye(d)
    p["value_proj"]["b"] = jnp.zeros((d,))
    p["out_proj"]["w"] = jnp.eye(d)
    p["out_proj"]["b"] = jnp.zeros((d,))
    h = w = 4
    value = jax.random.normal(jax.random.key(1), (1, h * w, d))
    # query = token 5 (row 1, col 1); its center in [0,1]
    ref = jnp.asarray([[[(1 + 0.5) / w, (1 + 0.5) / h]]])
    q = jnp.zeros((1, 1, d))
    out = gdino_lib.deformable_attention(p, q, ref, value, [(h, w)], heads, points)
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.asarray(value[0, 5]), atol=1e-5
    )


def test_gdino_forward_and_grounder(rng):
    cfg = gdino_lib.GDinoConfig.tiny()
    params = gdino_lib.init(rng, cfg)
    img = np.random.RandomState(0).randint(0, 255, (64, 80, 3), np.uint8)
    x = jnp.asarray(gdino_lib.preprocess(img, size=32))
    ids, tokens = gdino_lib.simple_tokenize("dog . cat", cfg.bert.vocab_size)
    mask = np.ones_like(ids)
    boxes, logits = gdino_lib.forward(
        params, cfg, x, jnp.asarray(ids), jnp.asarray(mask)
    )
    assert boxes.shape[-1] == 4 and boxes.shape[1] <= cfg.num_queries
    assert logits.shape[:2] == boxes.shape[:2]
    assert np.all((np.asarray(boxes) >= 0) & (np.asarray(boxes) <= 1))

    grounder = gdino_lib.make_grounder(params, cfg)
    b, lg, ph = grounder(img, "dog . cat", box_threshold=0.0, text_threshold=0.0)
    assert len(b) == len(lg) == len(ph)
    assert len(b) > 0  # threshold 0 keeps everything
