"""Codecs (passthrough + VQ-GAN + mel frontend) and grounding tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instructany2pix_tpu.codecs import builder as codec_builder
from instructany2pix_tpu.codecs import processors, vqgan
from instructany2pix_tpu.grounding import lib as glib
from instructany2pix_tpu.grounding import morphology as morph
from instructany2pix_tpu.grounding import sam as sam_lib


class TestCodecs:
    def test_vq_npz_config_builds_passthrough(self):
        vq = codec_builder.VQVAE("vq-npz", "vq-npz")
        assert vq.embed_dim_image == 1024 and vq.vocab_size_image == 1024
        x = np.random.RandomState(0).randn(2, 1024).astype(np.float32)
        out = vq({"image": x})
        q, ind, info = out["image"]
        np.testing.assert_allclose(q, x)
        assert ind is None and info is None

    def test_npz_loader(self, tmp_path):
        p = tmp_path / "f.npz"
        state = np.random.RandomState(0).randn(1024).astype(np.float32)
        np.savez(p, state=state)
        loaded = codec_builder.NpzLoader()(str(p))
        np.testing.assert_allclose(loaded, state)

    def test_mel_spectrogram_shape_and_tone(self):
        sr = 22050
        t = np.arange(sr) / sr
        wav = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        mel = processors.log_mel_spectrogram(wav, sr, n_mels=80)
        assert mel.shape[0] == 80
        # energy concentrates near the 440 Hz mel bin
        peak_bin = int(np.argmax(mel.mean(axis=1)))
        fb = processors.mel_filterbank(sr, 1024, 80)
        freqs = np.linspace(0, sr / 2, 513)
        center = freqs[np.argmax(fb[peak_bin])]
        assert 300 < center < 650, center

    def test_audio_processor_range(self):
        wav = np.random.RandomState(0).randn(22050).astype(np.float32)
        out = processors.AudioVAEProcessor()(wav)
        assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
        assert out.shape[0] == 80

    def test_vqgan_roundtrip_and_losses(self, rng):
        cfg = vqgan.VQConfig.tiny()
        params = vqgan.init(rng, cfg)
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 3))
        total, aux = vqgan.vq_losses(params, x, cfg)
        assert np.isfinite(float(total))
        assert aux["recon"].shape == x.shape
        assert aux["indices"].shape == (1, 8, 8)
        # straight-through: encoder receives gradient through quantization
        def loss_fn(p):
            t, _ = vqgan.vq_losses(p, x, cfg)
            return t
        grads = jax.grad(loss_fn)(params)
        gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads["encoder"]))
        assert gmax > 0

    def test_vqgan_codec_interface(self, rng):
        cfg = vqgan.VQConfig.tiny()
        codec = vqgan.VQGANCodec(vqgan.init(rng, cfg), cfg)
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 3))
        zq, idx, hw = codec.encode_seq(x)
        assert zq.shape == (1, 64, cfg.embed_dim) and hw == (8, 8)
        rec = codec.decode_seq(idx, hw)
        assert rec.shape == x.shape


class TestMorphology:
    def test_dilate_erode_roundtrip(self):
        m = jnp.zeros((32, 32)).at[10:20, 10:20].set(1.0)
        d = morph.dilate(m, 5)
        assert float(d.sum()) > float(m.sum())
        e = morph.erode(d, 5)
        np.testing.assert_allclose(np.asarray(e), np.asarray(m))

    def test_gaussian_blur_preserves_mass(self):
        m = jnp.zeros((33, 33)).at[16, 16].set(1.0)
        b = morph.gaussian_blur(m, 21)
        assert abs(float(b.sum()) - 1.0) < 1e-3
        assert float(b.max()) < 0.1

    def test_refine_mask_matches_reference_recipe(self):
        m = jnp.zeros((64, 64)).at[20:40, 20:40].set(1.0)
        out = morph.refine_mask(m, dilate_size=8, erode_size=4, blur_size=5)
        assert out.shape == m.shape
        assert float(out.max()) <= 1.0 and float(out.min()) >= 0.0
        # dilation dominates erosion → mask grows
        assert float((out > 0.5).sum()) > float(m.sum())


class TestGroundingLib:
    def test_phrase_matching(self):
        assert glib.match_phrase_to_box(["a dog", "cat"], "cat") == 1
        assert glib.match_phrase_to_box(["big dog"], "dog") == 0
        assert glib.match_phrase_to_box(["dog"], "zebra") is None

    def test_subject_consistency_with_fallbacks(self):
        img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
        calls = []

        def inpaint_fn(image, mask, embed, prompt):
            calls.append((mask.sum(), prompt))
            return image

        grounder = glib.cosine_fallback_grounder(None)
        out, ann = glib.subject_consistency(
            [{"name": "dog", "embed": np.zeros(4)}, {"name": "cat", "embed": np.zeros(4)}],
            "a dog and a cat in a park",
            img,
            glib.box_fill_segmentor,
            grounder,
            inpaint_fn,
        )
        # grounding text is the JOINED SUBJECT NAMES (reference
        # gdino/lib.py:70-81), not the caption
        assert ann["phrases"] == ["dog", "cat"]
        assert len(calls) == 2


class TestSAM:
    def test_box_mask_prediction_tiny(self, rng):
        cfg = sam_lib.SAMConfig.tiny()
        params = sam_lib.init(rng, cfg)
        img = np.random.RandomState(0).randint(0, 255, (48, 64, 3), np.uint8)
        mask = sam_lib.predict_box_mask(params, cfg, img, np.array([10, 10, 40, 30]))
        assert mask.shape == (48, 64)
        assert set(np.unique(mask)) <= {0.0, 1.0}

    def test_window_partition_roundtrip(self, rng):
        x = jax.random.normal(rng, (1, 6, 10, 4))
        w, pad_hw = sam_lib._window_partition(x, 4)
        back = sam_lib._window_unpartition(w, 4, pad_hw, (6, 10))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


class TestVQGANAdversarial:
    def test_generator_and_discriminator_losses(self, rng):
        from instructany2pix_tpu.codecs import vqgan_train as vt
        from instructany2pix_tpu.codecs import vqgan
        import jax.numpy as jnp

        vq_cfg = vqgan.VQConfig.tiny()
        d_cfg = vt.DiscConfig.tiny()
        vq_params = vqgan.init(jax.random.key(0), vq_cfg)
        d_params = vt.disc_init(jax.random.key(1), d_cfg)
        x = jax.random.normal(jax.random.key(2), (2, 16, 16, 3))

        # before disc_start the adversarial weight is zero
        g0, aux0 = vt.vqgan_generator_loss(
            vq_params, d_params, x, jnp.asarray(0), vq_cfg, d_cfg, disc_start=100
        )
        g1, aux1 = vt.vqgan_generator_loss(
            vq_params, d_params, x, jnp.asarray(500), vq_cfg, d_cfg, disc_start=100
        )
        assert float(aux0["adv_weight"]) == 0.0
        assert float(aux1["adv_weight"]) > 0.0
        assert np.isfinite(float(g0)) and np.isfinite(float(g1))

        d_loss, daux = vt.vqgan_discriminator_loss(
            d_params, vq_params, x, jnp.asarray(500), vq_cfg, d_cfg, disc_start=100
        )
        assert np.isfinite(float(d_loss))
        # grads flow into the discriminator only
        gd = jax.grad(
            lambda dp: vt.vqgan_discriminator_loss(
                dp, vq_params, x, jnp.asarray(500), vq_cfg, d_cfg, disc_start=100
            )[0]
        )(d_params)
        assert max(float(jnp.abs(g).max()) for g in jax.tree.leaves(gd)) > 0

    def test_perceptual_hook(self, rng):
        from instructany2pix_tpu.codecs import vqgan_train as vt
        from instructany2pix_tpu.codecs import vqgan
        import jax.numpy as jnp

        vq_cfg = vqgan.VQConfig.tiny()
        d_cfg = vt.DiscConfig.tiny()
        vq_params = vqgan.init(jax.random.key(0), vq_cfg)
        d_params = vt.disc_init(jax.random.key(1), d_cfg)
        x = jax.random.normal(jax.random.key(2), (1, 16, 16, 3))
        loss, aux = vt.vqgan_generator_loss(
            vq_params, d_params, x, jnp.asarray(0), vq_cfg, d_cfg,
            perceptual_fn=lambda im: im.mean(axis=-1),
        )
        assert "perceptual_loss" in aux
