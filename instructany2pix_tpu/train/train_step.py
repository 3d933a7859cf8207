"""pjit training step for the multimodal LLM.

Replaces the reference's HF Trainer + DeepSpeed ZeRO-3 loop (reference
train.py:712-931, training/trainer.py:224-287, scripts/zero3.json):
one jitted SPMD step with fully-sharded params (parallel.sharding),
optax AdamW + cosine schedule with linear warmup (the reference's
lr 2e-5 / 3% warmup / cosine, scripts/train.sh:31-41), global-norm grad
clipping (HF default 1.0), and the per-loss metrics dict
(`individual_losses`, reference any2pix_llama.py:342-427).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..llm import multimodal as mm
from ..parallel import sharding as sh


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-5
    warmup_ratio: float = 0.03
    total_steps: int = 10000
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.999


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=max(int(cfg.total_steps * cfg.warmup_ratio), 1),
        decay_steps=cfg.total_steps,
        end_value=0.0,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay
        ),
    )


def make_train_step(
    model_cfg: mm.Any2PixLMConfig,
    train_cfg: TrainConfig = TrainConfig(),
    mesh=None,
):
    """Returns (init_state, train_step). With a mesh, params/opt-state
    are fully sharded (ZeRO-3 equivalent) and the batch shards over the
    data axis; XLA inserts all collectives."""
    tx = make_optimizer(train_cfg)

    def init_state(params):
        if mesh is not None:
            params = sh.shard_params_fsdp(params, mesh)
        opt_state = tx.init(params)
        return {"params": params, "opt_state": opt_state, "step": jnp.zeros((), jnp.int32)}

    def loss_fn(params, batch):
        loss, individual = mm.train_forward(params, model_cfg, batch)
        return loss, individual

    def train_step(state, batch) -> Tuple[Dict[str, Any], Dict[str, jax.Array]]:
        (loss, individual), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch
        )
        updates, opt_state = tx.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **individual}
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            metrics,
        )

    jitted = jax.jit(train_step, donate_argnums=(0,))
    return init_state, jitted


def make_preview_step(model_cfg: mm.Any2PixLMConfig, mesh=None):
    """Jitted generation-preview forward — the trainer's periodic
    `return_generations` channel (reference trainer.py:248-272): every N
    steps the launcher runs this (no grads) and dumps a src/gen image
    pair. Returns `(params, batch) -> {"pred", "src", "has_gen"}`
    (see `mm.preview_generations`). Kept out of `train_step` so the hot
    graph carries no preview branch; the extra forward runs only on
    preview steps."""

    def preview_step(params, batch):
        return mm.preview_generations(params, model_cfg, batch)

    return jax.jit(preview_step)
