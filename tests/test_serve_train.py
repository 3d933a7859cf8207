"""Serve marker parsing + training data pipeline + train step."""

import json
import os

import jax
import numpy as np
import pytest

from instructany2pix_tpu.llm import multimodal as mm
from instructany2pix_tpu.llm.tokenizer import ByteTokenizer, initialize_vision_tokenizer
from instructany2pix_tpu.serve import MarkerError, parse_instruction
from instructany2pix_tpu.train import data as data_lib
from instructany2pix_tpu.train.train_step import TrainConfig, make_train_step


class TestServe:
    def test_parse_rewrites_markers_in_order(self):
        inst, mm_data = parse_instruction(
            "add [audio1] to [image1]",
            {"image1": "i.png", "audio1": "a.wav"},
        )
        assert inst == "add <video> to <video>"
        assert mm_data == [
            {"type": "audio", "fname": "a.wav"},
            {"type": "image", "fname": "i.png"},
        ]

    def test_parse_rejects_bad_inputs(self):
        with pytest.raises(MarkerError):
            parse_instruction("use [image9]", {})
        with pytest.raises(MarkerError):
            parse_instruction("[image1] and [image1]", {"image1": "x"})
        with pytest.raises(MarkerError):
            parse_instruction("[image1]", {})
        with pytest.raises(MarkerError):
            parse_instruction("hello", {"image1": "x"})


def _toy_dataset(tmp_path):
    feats = {}
    rs = np.random.RandomState(0)
    for name in ["a dog", "a cat", "base img", "target img"]:
        p = tmp_path / f"{name.replace(' ', '_')}.npz"
        np.savez(p, state=rs.randn(16).astype(np.float32))
        feats[name] = str(p.name)
    records = [
        {
            "conversations": [
                {"from": "human", "value": "add [a dog] to [a cat]"},
                {"from": "gpt", "value": "[a dog next to a cat]"},
            ],
            "base": "base img",
            "target": "target img",
            "modality": "image",
            "additions": ["a dog"],
        },
        {
            "conversations": [
                {"from": "human", "value": "make a sound like [a dog]"},
                {"from": "gpt", "value": "[dog barking]"},
            ],
            "target": "target img",
            "modality": "audio",
        },
    ]
    dp = tmp_path / "data.json"
    dp.write_text(json.dumps(records))
    return str(dp), data_lib.MediaMap(feats, root=str(tmp_path), dim=16)


class TestTrainData:
    def test_dataset_rewrite_and_collate(self, tmp_path):
        tok = ByteTokenizer()
        token_ids = initialize_vision_tokenizer(tok)
        dp, media = _toy_dataset(tmp_path)
        cfg = data_lib.DataConfig(max_length=512, video_prob=1.0,
                                  base_drop_prob=0.0, audio_codec_dim=8)
        ds = data_lib.InstructionDataset(dp, media, tok, token_ids, cfg, seed=0)
        assert len(ds) == 2
        ex = ds[0]
        # 2 INPUT (human brackets) + 1 BASE + 1 GEN (addition)
        types = [t for _, t in ex["replacements"]]
        assert types.count(0) == 2 and types.count(1) == 1 and types.count(2) == 1
        batch = data_lib.collate([ds[0], ds[1]], tok, token_ids, cfg, codec_dim=16)
        b, s = batch["input_ids"].shape
        assert b == 2
        assert batch["gen_mask_image"][0].sum() == 1  # one <im_gen>
        assert batch["gen_mask_audio"][1].sum() == 8  # 8 audio frames
        # replacement rows land on <video> positions
        vid = token_ids["<video>"]
        assert ((batch["replacement_type"] >= 0) <= (batch["input_ids"] == vid)).all()
        # labels: human rounds masked, response tokens kept
        assert (batch["labels"][0] == -100).sum() > 0
        assert (batch["labels"][0] != -100).sum() > 0

    def test_multimodal_input_audio_extra_inputs(self, tmp_path):
        """`multimodal_input` audio: `<audio>` expands ×8 in the human
        turn, the collator emits (B, 8, D) codec frames, and
        train_forward splices them (reference train.py:455-466 +
        any2pix_llama.py:311-322)."""
        tok = ByteTokenizer()
        token_ids = initialize_vision_tokenizer(tok)
        dp, media = _toy_dataset(tmp_path)
        cfg = data_lib.DataConfig(
            max_length=512, video_prob=1.0, base_drop_prob=0.0, audio_codec_dim=8
        )
        rec = {
            "conversations": [
                {"from": "human", "value": "what image matches <audio>?"},
                {"from": "gpt", "value": "[a dog photo]"},
            ],
            "target": "target img",
            "modality": "image",
            "multimodal_input": {"type": "audio", "src": "a dog"},
        }
        ex = data_lib.rewrite_example(rec, media, cfg, np.random.RandomState(0))
        assert ex["extra_audio"].shape == (8, 8)
        assert ex["conversations"][0]["value"].count("<audio>") == 8
        batch_np = data_lib.collate([ex], tok, token_ids, cfg, codec_dim=16)
        assert batch_np["extra_audio_frames"].shape == (1, 8, 8)
        aud_id = token_ids["<audio>"]
        assert (batch_np["input_ids"] == aud_id).sum() == 8
        # splice changes the loss vs dropping the frames
        lm_cfg = mm.Any2PixLMConfig.tiny(token_ids)
        params = mm.init(jax.random.key(0), lm_cfg)
        batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
        loss_a, _ = mm.train_forward(params, lm_cfg, batch)
        batch_no = {k: v for k, v in batch.items() if k != "extra_audio_frames"}
        loss_b, _ = mm.train_forward(params, lm_cfg, batch_no)
        assert np.isfinite(float(loss_a)) and float(loss_a) != float(loss_b)

    def test_length_grouped_indices_cover_all(self):
        lengths = [5, -3, 10, 2, -8, 1]
        idx = data_lib.length_grouped_indices(lengths, 2, np.random.RandomState(0))
        assert sorted(idx) == list(range(6))


class TestTrainStep:
    def test_two_steps_reduce_loss_single_device(self, tmp_path):
        tok = ByteTokenizer()
        token_ids = initialize_vision_tokenizer(tok)
        dp, media = _toy_dataset(tmp_path)
        # byte-level fallback tokenizer ≈1 token/char: the vicuna system
        # prompt alone is ~170 tokens, so keep headroom for the response
        cfg = mm.Any2PixLMConfig.tiny(token_ids)
        dcfg = data_lib.DataConfig(max_length=512, video_prob=1.0, base_drop_prob=0.0,
                                   audio_codec_dim=cfg.audio_codec_dim)
        ds = data_lib.InstructionDataset(dp, media, tok, token_ids, dcfg, seed=0)
        batch_np = data_lib.collate(
            [ds[0], ds[1]], tok, token_ids, dcfg,
            codec_dim=cfg.image_codec_dim,
        )
        batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
        params = mm.init(jax.random.key(0), cfg)
        # warmup step 1 runs at lr≈0 (cosine schedule ramps from 0), so
        # give the optimizer a few steps and a slow decay horizon
        init_state, step = make_train_step(
            cfg, TrainConfig(learning_rate=5e-3, total_steps=100)
        )
        state = init_state(params)
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        assert int(state["step"]) == 5

    def test_generation_preview_hook(self, tmp_path):
        """The trainer's periodic generation preview (reference
        trainer.py:248-272): preview_step extracts the predicted image
        embedding at the first <im_gen> position, and the launcher's
        hook dumps a src/gen pair via MetricLogger.dump_images."""
        from instructany2pix_tpu.train.train_step import make_preview_step
        from instructany2pix_tpu.utils.logging import (
            MetricLogger,
            embedding_heatmap,
        )

        tok = ByteTokenizer()
        token_ids = initialize_vision_tokenizer(tok)
        dp, media = _toy_dataset(tmp_path)
        cfg = mm.Any2PixLMConfig.tiny(token_ids)
        dcfg = data_lib.DataConfig(max_length=512, video_prob=1.0,
                                   base_drop_prob=0.0,
                                   audio_codec_dim=cfg.audio_codec_dim)
        ds = data_lib.InstructionDataset(dp, media, tok, token_ids, dcfg, seed=0)
        batch_np = data_lib.collate(
            [ds[0], ds[1]], tok, token_ids, dcfg, codec_dim=cfg.image_codec_dim
        )
        batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
        params = mm.init(jax.random.key(0), cfg)
        preview = make_preview_step(cfg)
        gen = jax.device_get(preview(params, batch))
        assert gen["pred"].shape == (2, cfg.image_codec_dim)
        assert gen["src"].shape == (2, cfg.image_codec_dim)
        # row 0 is the image-modality example (one <im_gen>); row 1 is
        # audio-only — no image-gen token
        assert bool(gen["has_gen"][0]) and not bool(gen["has_gen"][1])
        assert np.isfinite(gen["pred"][0]).all()
        # src at the gen position must be the actual codec target row
        pos = int(np.argmax(batch_np["gen_mask_image"][0]))
        np.testing.assert_allclose(
            gen["src"][0], batch_np["gen_target_image"][0, pos], rtol=1e-5
        )
        # rows without a gen token are zeroed, not garbage
        assert np.all(gen["pred"][1] == 0) and np.all(gen["src"][1] == 0)
        # the launcher hook: heatmap pair -> grid PNG on disk
        logger = MetricLogger()
        pair = np.stack([
            embedding_heatmap(gen["src"][0]),
            embedding_heatmap(gen["pred"][0]),
        ])
        out = logger.dump_images(50, pair, out_dir=str(tmp_path / "prev"))
        assert os.path.isfile(out)
