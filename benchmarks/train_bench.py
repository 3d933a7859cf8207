"""Training-step MFU at REAL 7B matmul widths (single chip).

PERF.md §6 attributes the 0.79 B proxy's 28 % MFU ceiling to the
proxy's own shape (hidden-1536 matmuls at M=8192 run far from peak) and
claims MFU rises at the real vicuna-7B widths. This bench MEASURES that
claim on one v5e: it runs the full `make_train_step` graph (multimodal
loss + grad clip + AdamW, reference per-device config batch 4 × seq
2048, train.sh:28-47) at hidden 4096 / intermediate 11008 / 32 heads /
vocab 32009 with 1 and 2 decoder layers, and takes the LAYER DIFFERENCE
t(2L) − t(1L) — embedding/loss/optimizer ends cancel exactly, leaving
the pure per-layer cost at 7B widths. The 32-layer step time and MFU
are then t_ends + 32·t_layer (the full model itself needs the v5e-8
FSDP path — memory arithmetic in PERF.md §5).

Params/activations bf16 (the reference trains bf16, train.sh:42),
remat policy "dots" (the measured r2 winner).

Run alone on the real chip from the repo root:
    python benchmarks/train_bench.py
"""

import sys

sys.path.insert(0, "/root/repo")

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.llm import constants as C
from instructany2pix_tpu.llm import multimodal as mm
from instructany2pix_tpu.models import llama
from instructany2pix_tpu.train.train_step import TrainConfig, make_train_step

B, S = 4, 2048
PEAK = 197e12  # v5e bf16


def make_batch(cfg, rs):
    ids = rs.randint(3, 31000, (B, S))
    ids[:, 5] = cfg.im_gen_token_id
    ids[:, 8] = cfg.video_token_id
    labels = ids.copy()
    labels[:, :3] = C.IGNORE_INDEX
    rep_type = np.full((B, S), -1)
    rep_type[:, 8] = C.REPLACEMENT_TYPE.INPUT
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((B, S), bool),
        "replacement_data": jnp.asarray(
            rs.randn(B, S, cfg.image_codec_dim), jnp.float32
        ),
        "replacement_type": jnp.asarray(rep_type),
        "gen_target_image": jnp.asarray(
            rs.randn(B, S, cfg.image_codec_dim), jnp.float32
        ),
        "gen_mask_image": jnp.asarray(ids == cfg.im_gen_token_id),
    }


def param_count(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


def measure(num_layers: int, steps: int = 8):
    lc = dataclasses.replace(
        llama.LlamaConfig.vicuna_7b(),
        num_layers=num_layers,
        remat=True,
        remat_policy="dots",
    )
    cfg = dataclasses.replace(
        mm.Any2PixLMConfig(), llama=lc,
        video_token_id=32004, im_gen_token_id=32000,
    )
    params = mm.init(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    n_params = param_count(params)

    init_state, train_step = make_train_step(cfg, TrainConfig(total_steps=100))
    state = init_state(params)
    batch = make_batch(cfg, np.random.RandomState(0))

    state, m = train_step(state, batch)  # compile
    float(m["loss"])
    # timed: donated state chains on device; sync once at the end
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = train_step(state, batch)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    flops = 6 * n_params * (B * S)
    print(
        f"L={num_layers}: {n_params/1e9:.3f}B params, step {dt*1e3:.1f} ms, "
        f"{B*S/dt:,.0f} tok/s, {flops/dt/1e12:.1f} TF/s = {flops/dt/PEAK*100:.1f}% MFU",
        flush=True,
    )
    return dt, n_params


def main():
    print(f"device {jax.devices()[0].device_kind}  batch {B}x{S}", flush=True)
    t1, n1 = measure(1)
    t2, n2 = measure(2)
    t_layer = t2 - t1
    n_layer = n2 - n1
    t_ends = t1 - t_layer
    f_layer = 6 * n_layer * (B * S)
    print(
        f"per-layer (7B widths): {t_layer*1e3:.1f} ms, "
        f"{f_layer/t_layer/1e12:.1f} TF/s = {f_layer/t_layer/PEAK*100:.1f}% layer MFU",
        flush=True,
    )
    n32 = n1 + 31 * n_layer
    t32 = t_ends + 32 * t_layer
    f32_ = 6 * n32 * (B * S)
    print(
        f"extrapolated 32-layer ({n32/1e9:.2f}B): step {t32:.2f} s, "
        f"{B*S/t32:,.0f} tok/s/chip, {f32_/t32/PEAK*100:.1f}% MFU "
        f"(ends {t_ends*1e3:.0f} ms amortized over 32 layers)",
        flush=True,
    )


if __name__ == "__main__":
    main()
