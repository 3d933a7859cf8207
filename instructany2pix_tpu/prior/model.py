"""InstructAny2Pix diffusion prior — GPT-2 over multimodal token
sequences, refining LLM-predicted embeddings in ImageBind space.

Rebuild of reference prior/model.py:109-794 with static-shape JAX
sequence assembly:

  * Per-key linear projections + per-key SOS/EOS token embeddings (32
    slots each), 10-way modality embedding, DDPM noise schedule from
    the SDXL config (reference prior/model.py:134,157-169).
  * Sequence order follows `sequence_input_key` (reference
    prior/__init__.py:12-21). NOTE a faithfully-reproduced reference
    quirk: that list contains `"noise_level" "tgt_type"` with a missing
    comma — Python concatenates them into one key `"noise_leveltgt_type"`
    that never matches a cond entry, so neither the noise-level
    embedding nor the target-modality token ever enters the GPT-2
    prompt; and in the `no_diffusion` path the noisy latent is stored
    under `'noisy_input'` (no s, prior/model.py:596) so it is excluded
    too. Effective prompt: [src_type, SOS|imagebind|EOS,
    SOS|text(77)|EOS, SOS|score|EOS (+ SOS|noisy|EOS when diffusing)].
  * `generate_diffusion` (prior/model.py:527-658): CFG doubles the
    batch (cond half first), GPT-2 AR-decodes `sequence_gen_length`
    tokens, sample-prediction → ε transform (`get_eps`,
    prior/model.py:208-239), CFG mix in ε space, DDPM step. The
    production `no_diffusion=True` single step at t=0 reduces exactly
    to x0-space CFG: x0_u + g·(x0_c − x0_u) (the random noisy seed
    cancels) — implemented here in closed form for that path and
    verified against the transform-chain in tests.
  * Training `forward` (prior/model.py:660-692): noise the target at a
    random timestep via `10·add_noise(target/10)`, teacher-force, L1
    on the shifted last hidden states.

Text conditioning (CLIP-ViT-H hidden states + attention mask,
reference prior/model.py:20-105) is passed in precomputed — the
pipeline owns the CLIP text encoder so the prior stays a pure function.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from ..diffusion.schedulers import Schedule, SchedulerConfig
from ..models import gpt2
from ..models import layers as L


class MODALITY:
    IMAGE = 0
    AUDIO = 1
    TEXT = 2
    VIDEO = 3


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    embed_dim: int = 1024
    output_dim: int = 1024
    sequence_gen_length: int = 1  # mae_token_num
    imagebind_dim: int = 1024
    text_dim: int = 1024  # CLIP-ViT-H hidden size
    score_dim: int = 512
    text_len: int = 77
    gpt2: gpt2.GPT2Config = gpt2.GPT2Config.medium()
    # key order of reference prior/__init__.py:12-21 (post-quirk)
    # (key, input_dim); dim 0 → identity projection
    sequence_input_key: Tuple[Tuple[str, int], ...] = (
        ("src_type", 0),
        ("imagebind", 1024),
        ("crossattn_clip", 1024),
        ("score", 512),
        ("noisy_inputs", 0),
    )

    @staticmethod
    def default() -> "PriorConfig":
        return PriorConfig()

    @staticmethod
    def tiny() -> "PriorConfig":
        return PriorConfig(
            embed_dim=32,
            output_dim=32,
            imagebind_dim=16,
            text_dim=24,
            score_dim=8,
            text_len=7,
            gpt2=gpt2.GPT2Config.tiny(),
            sequence_input_key=(
                ("src_type", 0),
                ("imagebind", 16),
                ("crossattn_clip", 24),
                ("score", 8),
                ("noisy_inputs", 0),
            ),
        )


def init(key, cfg: PriorConfig = PriorConfig()):
    kc = KeyChain(key)
    d = cfg.embed_dim
    p = {
        "sos": L.embedding_init(kc(), 32, d),
        "eos": L.embedding_init(kc(), 32, d),
        "modality_embedding": L.embedding_init(kc(), 10, d),
        "gpt2": gpt2.init(kc(), cfg.gpt2),
    }
    for i, (name, dim) in enumerate(cfg.sequence_input_key):
        if dim > 0:
            p[f"proj_{name}"] = L.linear_init(kc(), dim, d)
    if cfg.output_dim != cfg.embed_dim:
        p["output_proj"] = L.linear_init(kc(), d, cfg.output_dim)
    return p


def _key_id(cfg: PriorConfig, name: str) -> int:
    for i, (n, _) in enumerate(cfg.sequence_input_key):
        if n == name:
            return i
    raise KeyError(name)


def _with_sos_eos(params, kid, seq, mask):
    b = seq.shape[0]
    sos = jnp.broadcast_to(params["sos"]["w"][kid][None, None], (b, 1, seq.shape[-1]))
    eos = jnp.broadcast_to(params["eos"]["w"][kid][None, None], (b, 1, seq.shape[-1]))
    one = jnp.ones((b, 1), mask.dtype)
    return (
        jnp.concatenate([sos.astype(seq.dtype), seq, eos.astype(seq.dtype)], axis=1),
        jnp.concatenate([one, mask, one], axis=1),
    )


def assemble_sequence(
    params,
    cfg: PriorConfig,
    cond: Dict[str, jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Build (input_embeds, attn_mask) in sequence_input_key order
    (reference prior/model.py:299-381). cond values:
      src_type: (B,) or (B,1) int modality ids
      imagebind: (B, 1, imagebind_dim)
      crossattn_clip: tuple (hidden (B,T,text_dim), mask (B,T))
      score: (B, 1, score_dim)
      noisy_inputs: (B, L, embed_dim) — optional
    Keys absent from `cond` are skipped, like the reference.
    """
    embeds, masks = [], []
    for kid, (name, dim) in enumerate(cfg.sequence_input_key):
        if name not in cond:
            continue
        val = cond[name]
        if name in ("src_type", "tgt_type"):
            ids = val.reshape(val.shape[0], -1)
            e = L.embedding(params["modality_embedding"], ids)
            m = jnp.ones(ids.shape, jnp.float32)
            embeds.append(e)
            masks.append(m)
            continue
        if isinstance(val, (tuple, list)):
            seq, m = val
        else:
            seq = val
            m = jnp.ones(seq.shape[:2], jnp.float32)
        if dim > 0:
            seq = L.linear(params[f"proj_{name}"], seq)
        seq, m = _with_sos_eos(params, kid, seq, m)
        embeds.append(seq)
        masks.append(m)
    emb = jnp.concatenate(embeds, axis=1)
    mask = jnp.concatenate(masks, axis=1)
    max_len = cfg.gpt2.max_positions - cfg.sequence_gen_length
    if emb.shape[1] > max_len:  # truncate_sequence_and_mask
        emb, mask = emb[:, :max_len], mask[:, :max_len]
    return emb, mask


def _ar_decode(params, cfg: PriorConfig, emb, mask, steps: int):
    """GPT-2 AR decode of `steps` continuous tokens (reference
    prior/model.py:623-635): full-context re-forward per token, append
    last hidden state."""
    outs = []
    for _ in range(steps):
        h = gpt2.forward(params["gpt2"], cfg.gpt2, emb, attention_mask=mask)
        nxt = h[:, -1:]
        outs.append(nxt)
        emb = jnp.concatenate([emb, nxt], axis=1)
        mask = jnp.concatenate([mask, jnp.ones((mask.shape[0], 1), mask.dtype)], axis=1)
    return jnp.concatenate(outs, axis=1)


def _project_out(params, x):
    return L.linear(params["output_proj"], x) if "output_proj" in params else x


def score_embedding(score: float, dim: int = 512) -> jax.Array:
    """Aesthetic-score conditioning as a sinusoidal embedding (reference
    prior/model.py:565-568)."""
    return L.timestep_embedding(
        jnp.asarray([score], jnp.float32), dim, flip_sin_to_cos=True,
        downscale_freq_shift=0.0,
    ).reshape(1, 1, dim)


def generate_diffusion(
    params,
    cfg: PriorConfig,
    src_type: int,
    tgt_type: int,
    src: jax.Array,  # (B, imagebind_dim) source embedding (VIDEO/IMAGE src)
    text_hidden: jax.Array,  # (B, T, text_dim) CLIP hidden of "" prompt
    text_mask: jax.Array,  # (B, T)
    key: Optional[jax.Array] = None,
    num_inference_steps: int = 25,
    guidance_scale: float = 5.0,
    score: float = 6.8,
    negative_score: float = 2.0,
    no_diffusion: bool = False,
    schedule: Optional[Schedule] = None,
) -> jax.Array:
    """Returns refined embedding (B, sequence_gen_length, output_dim)."""
    b = src.shape[0]
    sched = schedule or Schedule.create(SchedulerConfig())
    score_emb = jnp.tile(score_embedding(score, cfg.score_dim), (b, 1, 1))
    neg_score_emb = jnp.tile(
        score_embedding(negative_score, cfg.score_dim), (b, 1, 1)
    )

    # CFG layout: cond half first, uncond half second
    # (reference prior/model.py:576-584,643)
    def dup(c, u):
        return jnp.concatenate([c, u], axis=0)

    imagebind = src.reshape(b, 1, -1)
    cond = {
        "src_type": dup(
            jnp.full((b, 1), src_type, jnp.int32), jnp.full((b, 1), src_type, jnp.int32)
        ),
        "imagebind": dup(imagebind, jnp.zeros_like(imagebind)),
        "crossattn_clip": (
            dup(text_hidden, text_hidden),
            dup(text_mask, text_mask),
        ),
        "score": dup(score_emb, neg_score_emb),
    }

    if no_diffusion:
        # Single step at t=0; noisy seed cancels exactly (see module
        # docstring) → closed-form x0-space CFG.
        emb, mask = assemble_sequence(params, cfg, cond)
        out = _ar_decode(params, cfg, emb, mask, cfg.sequence_gen_length)
        x0_c, x0_u = jnp.split(out, 2, axis=0)
        return _project_out(params, x0_u + guidance_scale * (x0_c - x0_u))

    assert key is not None, "diffusion sampling needs a PRNG key"
    kc = KeyChain(key)
    latents = jax.random.normal(kc(), (b, cfg.sequence_gen_length, cfg.embed_dim))
    ts = sched.ddpm_timesteps(num_inference_steps)
    ratio = sched.cfg.num_train_timesteps // num_inference_steps
    for i in range(num_inference_steps):
        t = ts[i]
        cond["noisy_inputs"] = jnp.concatenate([latents, latents], axis=0)
        emb, mask = assemble_sequence(params, cfg, cond)
        out = _ar_decode(params, cfg, emb, mask, cfg.sequence_gen_length)
        # GPT-2 output is a SAMPLE prediction; convert to ε explicitly
        # (reference get_eps, prior/model.py:208-239 — hardcoded formula,
        # independent of the scheduler's prediction_type)
        a = sched.alpha_bar(jnp.full((2 * b,), t)).reshape(-1, 1, 1)
        eps = (cond["noisy_inputs"] - jnp.sqrt(a) * out) / jnp.sqrt(1.0 - a)
        eps_c, eps_u = jnp.split(eps, 2, axis=0)
        eps_mix = eps_u + guidance_scale * (eps_c - eps_u)
        latents = sched.ddpm_step(
            eps_mix, jnp.full((b,), t), latents, kc(), t_prev=jnp.full((b,), t - ratio)
        )
    return _project_out(params, latents)


def train_forward(
    params,
    cfg: PriorConfig,
    cond: Dict[str, jax.Array],
    target: jax.Array,  # (B, L, embed_dim)
    key: jax.Array,
    schedule: Optional[Schedule] = None,
):
    """Teacher-forced L1 training loss (reference prior/model.py:660-692)."""
    sched = schedule or Schedule.create(SchedulerConfig())
    b = target.shape[0]
    kc = KeyChain(key)
    t = jax.random.randint(kc(), (b,), 0, sched.cfg.num_train_timesteps)
    noise = jax.random.normal(kc(), target.shape, target.dtype)
    noisy = 10.0 * sched.add_noise(target / 10.0, noise, t)
    cond = dict(cond)
    cond["noisy_inputs"] = noisy
    # noise_level computed but never assembled — reference quirk (see
    # module docstring); we don't compute it at all.
    emb, mask = assemble_sequence(params, cfg, cond)
    tlen = target.shape[1]
    emb = jnp.concatenate([emb, target], axis=1)
    mask = jnp.concatenate([mask, jnp.ones((b, tlen), mask.dtype)], axis=1)
    h = gpt2.forward(params["gpt2"], cfg.gpt2, emb, attention_mask=mask)
    shifted = h[:, -1 - tlen : -1]
    loss = jnp.mean(jnp.abs(shifted.astype(jnp.float32) - target.astype(jnp.float32)))
    return loss


def generate(params, cfg: PriorConfig, cond: Dict[str, jax.Array]):
    """Plain AR generation, no diffusion (reference prior/model.py:474-507):
    assemble the conditioning prompt and decode sequence_gen_length
    continuous tokens."""
    emb, mask = assemble_sequence(params, cfg, cond)
    out = _ar_decode(params, cfg, emb, mask, cfg.sequence_gen_length)
    return _project_out(params, out)


def generate_partial(
    params, cfg: PriorConfig, cond: Dict[str, jax.Array], target: jax.Array
):
    """In-context partial generation (reference prior/model.py:422-472):
    prefix the first quarter of the target sequence, decode the rest."""
    emb, mask = assemble_sequence(params, cfg, cond)
    t = target.shape[1]
    prefix = target[:, : t // 4]
    emb = jnp.concatenate([emb, prefix], axis=1)
    mask = jnp.concatenate(
        [mask, jnp.ones((mask.shape[0], prefix.shape[1]), mask.dtype)], axis=1
    )
    end = emb.shape[1] - prefix.shape[1]
    out = _ar_decode(params, cfg, emb, mask, max(3 * t // 4, 1))
    full = jnp.concatenate([prefix, out], axis=1)
    return _project_out(params, full)


# ------------------------------------------------------------ training aux


def make_optimizer(
    learning_rate: float,
    weight_decay: float = 0.0,
    warmup_steps: int = 1000,
    step_size_epochs: int = 5,
    gamma: float = 0.8,
    steps_per_epoch: int = 1000,
):
    """The prior's training optimizer (reference prior/model.py:262-270
    `configure_optimizers`: AdamW + StepLR(step_size=5, γ=0.8), plus the
    `warmup_step` hook :383-401 — 1000-step linear warmup) as one optax
    chain. Lightning steps the StepLR per EPOCH; pass `steps_per_epoch`
    to reproduce that cadence."""
    import optax

    def schedule(step):
        warm = jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
        epoch = step // steps_per_epoch
        return learning_rate * warm * gamma ** (epoch // step_size_epochs)

    return optax.chain(
        optax.scale_by_adam(),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(schedule),
    )


def mask_target_sequence(
    target: jax.Array,  # (B, L, D)
    attn_mask: jax.Array,  # (B, L)
    key: jax.Array,
    mask_ratio: float,
    random_ratio: bool = False,
):
    """Reference prior/model.py:403-420: randomly zero target embeddings
    (and their attention slots) at `mask_ratio` — optionally a uniform
    draw in [0, mask_ratio] per batch (`random_mask_ratio`). Returns
    (masked_target, masked_attn_mask, keep_mask)."""
    if mask_ratio <= 1e-4:
        return target, attn_mask, None
    kc = KeyChain(key)
    b, l, _ = target.shape
    ratio = (
        jax.random.uniform(kc(), ()) * mask_ratio if random_ratio else mask_ratio
    )
    keep = jax.random.uniform(kc(), (b, l)) > ratio
    masked = jnp.where(keep[..., None], target, jnp.zeros_like(target))
    return masked, attn_mask * keep.astype(attn_mask.dtype), keep


def param_count(params) -> int:
    """Reference's parameter-count helpers (prior/model.py:747-794)."""
    return int(sum(x.size for x in jax.tree.leaves(params)))
