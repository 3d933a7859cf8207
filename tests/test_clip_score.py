"""CLIP-score harness (BASELINE quality metric, VERDICT r2 missing #2)."""

import jax
import numpy as np
import pytest

from instructany2pix_tpu.models import clip as clip_lib
from instructany2pix_tpu.utils import clip_score as cs


@pytest.fixture(scope="module")
def towers():
    tcfg = clip_lib.CLIPTextConfig.tiny()
    tcfg = tcfg.__class__(**{**tcfg.__dict__, "projection_dim": 16})
    vcfg = clip_lib.CLIPVisionConfig.tiny()
    tp = clip_lib.text_init(jax.random.key(0), tcfg)
    vp = clip_lib.vision_init(jax.random.key(1), vcfg)

    class ByteTok:
        def encode(self, s):
            return [min(b, tcfg.vocab_size - 1) for b in s.encode()][:16]

    return tp, tcfg, ByteTok(), vp, vcfg


def test_clip_score_shape_and_range(towers):
    tp, tcfg, tok, vp, vcfg = towers
    rs = np.random.RandomState(0)
    imgs = [rs.randint(0, 255, (32, 40, 3), np.uint8) for _ in range(3)]
    prompts = ["a cat", "a dog", "a clock"]
    scores = cs.clip_score(tp, tcfg, tok, vp, vcfg, imgs, prompts)
    assert scores.shape == (3,)
    assert np.all(scores >= 0) and np.all(scores <= 100)


def test_clip_score_identity_alignment(towers):
    """An image embed aligned with its own text embed scores 100;
    orthogonal pairs score ≤ their cosine — sanity of the formula via
    direct embedding computation."""
    tp, tcfg, tok, vp, vcfg = towers
    t = cs.clip_text_embed(tp, tcfg, tok, ["hello world"])
    assert np.isclose(float(np.linalg.norm(np.asarray(t))), 1.0, atol=1e-5)
    v = cs.clip_image_embed(
        vp, vcfg, [np.zeros((28, 28, 3), np.uint8)]
    )
    cos = float(np.sum(np.asarray(t) * np.asarray(v)))
    scores = cs.clip_score(
        tp, tcfg, tok, vp, vcfg, [np.zeros((28, 28, 3), np.uint8)],
        ["hello world"],
    )
    assert np.isclose(scores[0], 100 * max(cos, 0.0), atol=1e-3)


def test_regression_kit_roundtrip(tmp_path):
    kit = cs.RegressionKit(str(tmp_path / "scores.json"), tolerance=1.0)
    kit.record({"prompt_a": 31.5, "prompt_b": 28.0})
    # reload from disk
    kit2 = cs.RegressionKit(str(tmp_path / "scores.json"), tolerance=1.0)
    assert kit2.records == {"prompt_a": 31.5, "prompt_b": 28.0}
    assert kit2.check({"prompt_a": 31.0}) == []  # within tolerance
    assert kit2.check({"prompt_a": 29.9}) == ["prompt_a"]
    assert kit2.check({"prompt_new": 5.0}) == []  # unrecorded → pass


def test_load_scoring_clip_absent(tmp_path):
    assert cs.load_scoring_clip(str(tmp_path)) is None
