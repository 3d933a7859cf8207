"""mm_utils + prior AR generation tests."""

import numpy as np
import jax
import jax.numpy as jnp

from instructany2pix_tpu.llm import mm_utils
from instructany2pix_tpu.llm.tokenizer import ByteTokenizer, initialize_vision_tokenizer
from instructany2pix_tpu.prior import model as prior


def test_tokenizer_image_token_splices_sentinel():
    tok = ByteTokenizer()
    ids = mm_utils.tokenizer_image_token("a<image>b", tok)
    assert (ids == mm_utils.IMAGE_TOKEN_INDEX).sum() == 1
    # surrounding text survives
    decoded = tok.decode([i for i in ids if i >= 0])
    assert "a" in decoded and "b" in decoded


def test_keywords_stopping_criteria():
    tok = ByteTokenizer()
    crit = mm_utils.KeywordsStoppingCriteria(["</s>"], tok, input_len=2)
    prompt = tok.encode("hi")
    out = prompt + tok.encode("done</s>", add_special_tokens=False)
    assert crit(out) is True
    assert crit(prompt + tok.encode("not yet", add_special_tokens=False)) is False


def test_expand2square_and_process_images():
    img = np.zeros((10, 20, 3), np.uint8)
    sq = mm_utils.expand2square(img)
    assert sq.shape == (20, 20, 3)
    assert sq[0, 0, 0] == 122  # background fill
    batch = mm_utils.process_images([img, np.zeros((30, 7, 3), np.uint8)], 16)
    assert batch.shape == (2, 16, 16, 3)


def test_prior_ar_generate_and_partial(rng):
    cfg = prior.PriorConfig.tiny()
    params = prior.init(rng, cfg)
    rs = np.random.RandomState(0)
    cond = {
        "src_type": jnp.full((1, 1), prior.MODALITY.AUDIO, jnp.int32),
        "imagebind": jnp.asarray(rs.randn(1, 1, cfg.imagebind_dim), jnp.float32),
        "crossattn_clip": (
            jnp.asarray(rs.randn(1, cfg.text_len, cfg.text_dim), jnp.float32),
            jnp.ones((1, cfg.text_len), jnp.float32),
        ),
        "score": jnp.asarray(rs.randn(1, 1, cfg.score_dim), jnp.float32),
    }
    out = prior.generate(params, cfg, cond)
    assert out.shape == (1, cfg.sequence_gen_length, cfg.output_dim)

    target = jnp.asarray(rs.randn(1, 8, cfg.embed_dim), jnp.float32)
    out_p = prior.generate_partial(params, cfg, cond, target)
    assert out_p.shape[0] == 1 and out_p.shape[1] >= 8
    # prefix preserved verbatim
    np.testing.assert_allclose(
        np.asarray(out_p[:, :2]), np.asarray(target[:, :2]), atol=1e-6
    )
