"""Training launcher — the `deepspeed train.py` equivalent.

Single SPMD process over all visible TPU devices (GSPMD replaces the
reference's multi-rank DeepSpeed launch, scripts/train.sh:7-13):

  python scripts/train.py --data data.json --media-map map.json \
      --media-root feats/ [--tiny] [--steps N] ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--media-map", default=None)
    ap.add_argument("--media-root", default="")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--max-length", type=int, default=2048)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--n-model", type=int, default=1, help="tensor-parallel axis size")
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--save-steps", type=int, default=500)
    ap.add_argument("--log-steps", type=int, default=10)
    ap.add_argument("--preview-steps", type=int, default=50,
                    help="every N steps, run the generation-preview "
                         "forward and dump a src/gen image pair "
                         "(reference trainer.py:248-272 does this every "
                         "50 steps); 0 disables")
    ap.add_argument("--preview-dir", default="train_images")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--remat-policy", default="dots", choices=["full", "dots"],
                    help="grad-checkpoint policy: 'dots' saves matmul outputs "
                         "(+10%% step throughput measured, more activation "
                         "memory); 'full' recomputes everything")
    ap.add_argument("--scan-layers", action="store_true",
                    help="stack decoder layers and run them as one lax.scan "
                         "block (llama.stack_layers): much smaller HLO / "
                         "faster compile, per-layer dispatch overhead paid "
                         "once. Incompatible with LoRA (per-layer paths).")
    args = ap.parse_args()

    from instructany2pix_tpu.core import checkpoint as ckpt_lib
    from instructany2pix_tpu.core.mesh import make_mesh
    from instructany2pix_tpu.llm import multimodal as mm
    from instructany2pix_tpu.llm.tokenizer import (
        initialize_vision_tokenizer,
        load_tokenizer,
    )
    from instructany2pix_tpu.train import data as data_lib
    from instructany2pix_tpu.train.train_step import (
        TrainConfig,
        make_preview_step,
        make_train_step,
    )
    from instructany2pix_tpu.utils.logging import MetricLogger, embedding_heatmap

    tokenizer = load_tokenizer(None)
    token_ids = initialize_vision_tokenizer(tokenizer)
    cfg = mm.Any2PixLMConfig.tiny(token_ids) if args.tiny else mm.Any2PixLMConfig()
    import dataclasses as _dc
    cfg = _dc.replace(cfg, llama=_dc.replace(
        cfg.llama, remat=True, remat_policy=args.remat_policy))

    media_map = {}
    if args.media_map:
        with open(args.media_map) as f:
            media_map = json.load(f)
    media = data_lib.MediaMap(media_map, args.media_root, dim=cfg.image_codec_dim)
    dcfg = data_lib.DataConfig(max_length=args.max_length,
                               audio_codec_dim=cfg.audio_codec_dim)
    ds = data_lib.InstructionDataset(args.data, media, tokenizer, token_ids, dcfg)
    print(f"dataset: {len(ds)} examples; devices: {jax.devices()}")

    mesh = make_mesh(n_model=args.n_model) if len(jax.devices()) > 1 else None
    init_state, train_step = make_train_step(
        cfg,
        TrainConfig(learning_rate=args.lr, total_steps=args.steps),
        mesh=mesh,
    )
    params = mm.init(jax.random.key(0), cfg)
    if args.scan_layers:
        from instructany2pix_tpu.models import llama as llama_lib

        params["llama"] = llama_lib.stack_layers(params["llama"], cfg.llama)
    state = init_state(params)
    start_step = 0
    latest = os.path.join(args.ckpt_dir, "latest")
    if args.resume and os.path.isdir(latest):
        state = ckpt_lib.restore(latest, like=state)
        start_step = int(state["step"])
        print(f"resumed from step {start_step}")

    logger = MetricLogger()
    preview_step = None
    rng = np.random.RandomState(0)
    order = data_lib.length_grouped_indices(ds.modality_lengths, args.batch_size, rng)
    pos = 0
    t0 = time.time()
    for step_i in range(start_step, args.steps):
        idx = [order[(pos + i) % len(order)] for i in range(args.batch_size)]
        pos += args.batch_size
        batch_np = data_lib.collate(
            [ds[int(i)] for i in idx], tokenizer, token_ids, dcfg,
            codec_dim=cfg.image_codec_dim,
        )
        batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
        state, metrics = train_step(state, batch)
        if (step_i + 1) % args.log_steps == 0:
            logger.log(step_i + 1, {k: float(v) for k, v in metrics.items()})
        if (
            args.preview_steps
            and (step_i + 1) % args.preview_steps == 0
            and "gen_target_image" in batch
        ):
            if preview_step is None:
                preview_step = make_preview_step(cfg, mesh=mesh)
            gen = jax.device_get(preview_step(state["params"], batch))
            rows = np.nonzero(gen["has_gen"])[0]
            if rows.size:
                r = int(rows[0])
                pair = np.stack([
                    embedding_heatmap(gen["src"][r]),
                    embedding_heatmap(gen["pred"][r]),
                ])
                p = logger.dump_images(step_i + 1, pair, out_dir=args.preview_dir)
                print(f"preview (src|gen embeddings) -> {p}")
        if (step_i + 1) % args.save_steps == 0 or step_i + 1 == args.steps:
            ckpt_lib.save(latest, jax.device_get(state))
            print(f"saved checkpoint at step {step_i + 1}")
    print(f"done: {args.steps - start_step} steps in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
