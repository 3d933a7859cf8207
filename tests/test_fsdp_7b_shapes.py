"""7B-at-shape FSDP proof (VERDICT r2 weak #6).

Runs `make_train_step` with the REAL vicuna-7B dimensions (hidden 4096,
intermediate 11008, 32 heads, vocab 32009 — `LlamaConfig.vicuna_7b()`)
on the 8-device virtual mesh. Layer count is reduced to 2 and the
sequence shortened (this host has one CPU core); neither changes the
per-layer sharding or the bytes-per-device arithmetic being proven.
The full 32-layer memory table lives in docs/PERF.md §5.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instructany2pix_tpu.core import tree as tree_util
from instructany2pix_tpu.llm import constants as C
from instructany2pix_tpu.llm import multimodal as mm
from instructany2pix_tpu.models import llama
from instructany2pix_tpu.parallel import sharding as sh
from instructany2pix_tpu.train.train_step import TrainConfig, make_train_step


@pytest.mark.slow
def test_7b_dims_fsdp_train_step(mesh8):
    lc = dataclasses.replace(llama.LlamaConfig.vicuna_7b(), num_layers=2)
    cfg = dataclasses.replace(
        mm.Any2PixLMConfig(), llama=lc,
        video_token_id=32004, im_gen_token_id=32000,
    )
    params = mm.init(jax.random.key(0), cfg)

    init_state, train_step = make_train_step(
        cfg, TrainConfig(total_steps=10), mesh=mesh8
    )
    with jax.set_mesh(mesh8):
        state = init_state(params)

        # --- sharding/memory proof: every 7B-dim matrix is actually
        # sharded; per-device bytes are 1/8 of the total
        flat = tree_util.flatten(state["params"])
        qw = flat["llama.layer_0.q.w"]
        assert qw.shape == (4096, 4096)
        assert not qw.sharding.is_fully_replicated
        gw = flat["llama.layer_0.gate.w"]
        assert gw.shape == (4096, 11008)
        assert not gw.sharding.is_fully_replicated

        def nbytes(tree):
            return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))

        param_b = nbytes(state["params"])
        opt_b = nbytes(state["opt_state"])
        # AdamW m+v ≈ 2× params (plus scalar counts)
        assert opt_b > 1.9 * param_b
        # per-device share ≈ total/8 for the sharded majority
        shard_b = sum(
            x.size * x.dtype.itemsize // (1 if x.sharding.is_fully_replicated else 8)
            for x in jax.tree.leaves(state["params"])
        )
        assert shard_b < 0.2 * param_b  # >80 % of bytes are 8-way sharded

        b, s = 8, 64
        rs = np.random.RandomState(0)
        ids = rs.randint(3, 31000, (b, s))
        ids[:, 5] = cfg.im_gen_token_id
        ids[:, 8] = cfg.video_token_id
        labels = ids.copy()
        labels[:, :3] = C.IGNORE_INDEX
        rep_type = np.full((b, s), -1)
        rep_type[:, 8] = C.REPLACEMENT_TYPE.INPUT
        batch = {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(labels),
            "attention_mask": jnp.ones((b, s), bool),
            "replacement_data": jnp.asarray(
                rs.randn(b, s, cfg.image_codec_dim), jnp.float32
            ),
            "replacement_type": jnp.asarray(rep_type),
            "gen_target_image": jnp.asarray(
                rs.randn(b, s, cfg.image_codec_dim), jnp.float32
            ),
            "gen_mask_image": jnp.asarray(ids == cfg.im_gen_token_id),
        }
        batch = {
            k: jax.device_put(
                v,
                jax.sharding.NamedSharding(
                    mesh8, sh.batch_spec(getattr(v, "ndim", 1))
                ),
            )
            for k, v in batch.items()
        }
        state, metrics = train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
