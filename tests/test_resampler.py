"""Resampler shape test — the one automated test the reference ships
(reference diffusion/ip_adapter/test_resampler.py:13-44), made
first-class, plus semantics checks."""

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.diffusion import resampler as R
from instructany2pix_tpu.models import clip as clip_lib


def test_resampler_shapes_from_clip_features(rng):
    """Mirror of the reference test: CLIP penultimate hidden states →
    (B, num_queries + mean_pooled, output_dim)."""
    vcfg = clip_lib.CLIPVisionConfig.tiny()
    vparams = clip_lib.vision_init(rng, vcfg)
    px = jax.random.normal(jax.random.key(1), (2, 28, 28, 3))
    hidden = clip_lib.vision_apply(vparams, px, vcfg)["hidden_states"][-2]

    cfg = R.ResamplerConfig(
        dim=32, depth=2, dim_head=8, heads=4, num_queries=4,
        embedding_dim=vcfg.hidden_size, output_dim=24, ff_mult=2,
        max_seq_len=10, apply_pos_emb=False, num_latents_mean_pooled=1,
    )
    params = R.init(jax.random.key(2), cfg)
    ip_tokens = R.apply(params, hidden, cfg)
    assert ip_tokens.shape == (2, 4 + 1, 24)
    assert np.all(np.isfinite(np.asarray(ip_tokens)))


def test_resampler_pos_emb_and_batch_independence(rng):
    cfg = R.ResamplerConfig.tiny()
    cfg_pos = R.ResamplerConfig(
        **{**cfg.__dict__, "apply_pos_emb": True}
    )
    params = R.init(rng, cfg_pos)
    x = jax.random.normal(jax.random.key(1), (2, 9, cfg.embedding_dim))
    out = R.apply(params, x, cfg_pos)
    assert out.shape == (2, cfg.num_queries, cfg.output_dim)
    # batch independence: single-sample forward equals batched row
    out0 = R.apply(params, x[:1], cfg_pos)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(out0[0]), atol=1e-5, rtol=1e-5
    )


def test_preprocess_clip_image_rescales_by_dtype():
    """Near-black uint8 images must still be divided by 255 (dtype, not
    value range, decides — r2 review fix); float inputs in [0,1] are
    left unscaled."""
    import numpy as np

    from instructany2pix_tpu.diffusion.ip_adapter import preprocess_clip_image

    dark_u8 = np.zeros((32, 32, 3), np.uint8)
    dark_u8[0, 0] = 1  # max value 1 — the old max()>1.5 heuristic missed this
    a = np.asarray(preprocess_clip_image(dark_u8, image_size=16))
    dark_f = dark_u8.astype(np.float32) / 255.0
    b = np.asarray(preprocess_clip_image(dark_f, image_size=16))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # a pure-black uint8 and pure-black float agree too
    z = np.asarray(preprocess_clip_image(np.zeros((32, 32, 3), np.uint8), image_size=16))
    z2 = np.asarray(preprocess_clip_image(np.zeros((32, 32, 3), np.float32), image_size=16))
    np.testing.assert_allclose(z, z2, atol=1e-6)
