"""Any2Pix multimodal LM: Llama backbone + codec projectors/predictors.

Rebuild of `InstructAny2PixLMForCausalLM` + meta-arch (reference
llm/model/language_model/any2pix_llama.py:177-446,
llm/model/any2pix_arch.py:30-299) with TPU-friendly dense masking in
place of the reference's ragged gather/scatter:

  * `vae_projector_image/audio` — mlp2x_gelu codec→hidden projectors
    (reference multimodal_projector/builder.py:33-52).
  * `vae_predictor_image/audio` — hidden→codec predictors
    (builder.py:54-74).
  * `splice_input_embeds` — inference-time `extra_replacement`: the
    j-th `<video>` token takes the projected j-th conditioning row
    (any2pix_llama.py:278-296), as a dense gather instead of
    torch.where scatter.
  * `train_forward` — full loss stack (any2pix_llama.py:364-427):
    LM cross-entropy + continuous-codec MSE×dim head losses at
    gen-token positions (hidden state at p-1 predicts target at p) +
    L1 `loss_extra` at BASE/GEN `<video>` positions; per-loss dict in
    `individual_losses`.

The shipped codec path is the vq-npz passthrough (precomputed 1024-d
ImageBind/CLIP embeddings — reference vae/vq-npz.yaml), i.e. the
continuous branch; discrete-VQ CE is covered by the codecs package.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.prng import KeyChain
from ..models import layers as L
from ..models import llama
from .constants import IGNORE_INDEX, REPLACEMENT_TYPE


@dataclasses.dataclass(frozen=True)
class Any2PixLMConfig:
    llama: llama.LlamaConfig = llama.LlamaConfig.vicuna_7b()
    image_codec_dim: int = 1024  # ImageBind/CLIP embedding dim
    audio_codec_dim: int = 768
    # discrete VQ codecs: predictor outputs codebook logits (reference
    # build_vision_predictor with vocab_size out); None = continuous
    image_vocab_size: Optional[int] = None
    audio_vocab_size: Optional[int] = None
    video_token_id: int = 32004  # <video> — 5th of 9 added tokens
    im_gen_token_id: int = 32000
    audio_gen_token_id: int = 32001
    audio_token_id: int = 32005
    base_token_id: int = 32007

    @staticmethod
    def tiny(token_ids: Optional[Dict[str, int]] = None) -> "Any2PixLMConfig":
        ids = token_ids or {}
        return Any2PixLMConfig(
            llama=llama.LlamaConfig.tiny(vocab_size=280),
            image_codec_dim=16,
            audio_codec_dim=8,
            video_token_id=ids.get("<video>", 263),
            im_gen_token_id=ids.get("<im_gen>", 259),
            audio_gen_token_id=ids.get("<audio_gen>", 260),
            audio_token_id=ids.get("<audio>", 264),
            base_token_id=ids.get("<base>", 266),
        )


def _projector_init(kc, in_dim, hidden):
    # mlp2x_gelu: Linear(in,h) → GELU → Linear(h,h)
    return {
        "fc1": L.linear_init(kc(), in_dim, hidden),
        "fc2": L.linear_init(kc(), hidden, hidden),
    }


def _projector(p, x):
    return L.linear(p["fc2"], L.gelu(L.linear(p["fc1"], x)))


def _predictor_init(kc, hidden, out_dim):
    # mlp2x_gelu predictor: Linear(h,h) → GELU → Linear(h,out)
    return {
        "fc1": L.linear_init(kc(), hidden, hidden),
        "fc2": L.linear_init(kc(), hidden, out_dim),
    }


def _predictor(p, x):
    return L.linear(p["fc2"], L.gelu(L.linear(p["fc1"], x)))


def init(key, cfg: Any2PixLMConfig):
    kc = KeyChain(key)
    d = cfg.llama.hidden_size
    return {
        "llama": llama.init(kc(), cfg.llama),
        "vae_projector_image": _projector_init(kc, cfg.image_codec_dim, d),
        "vae_projector_audio": _projector_init(kc, cfg.audio_codec_dim, d),
        "vae_predictor_image": _predictor_init(
            kc, d, cfg.image_vocab_size or cfg.image_codec_dim
        ),
        "vae_predictor_audio": _predictor_init(
            kc, d, cfg.audio_vocab_size or cfg.audio_codec_dim
        ),
    }


def predict_image_embedding(params, hidden):
    """vae_predictor_image readout (reference pipeline.py:236)."""
    return _predictor(params["vae_predictor_image"], hidden)


def predict_audio_embedding(params, hidden):
    return _predictor(params["vae_predictor_audio"], hidden)


def splice_input_embeds(
    params,
    cfg: Any2PixLMConfig,
    input_ids: jax.Array,  # (B, S)
    replacement_data: Optional[jax.Array] = None,  # (R, image_codec_dim)
    replacement_types: Optional[jax.Array] = None,  # (R,) REPLACEMENT_TYPE
) -> jax.Array:
    """Token embeddings with `<video>` slots overwritten by projected
    conditioning embeddings (INPUT-type rows only)."""
    embeds = llama.embed(params["llama"], input_ids)
    if replacement_data is None or replacement_data.shape[0] == 0:
        return embeds
    proj = _projector(params["vae_projector_image"], replacement_data)  # (R, D)
    r = proj.shape[0]
    is_vid = input_ids == cfg.video_token_id
    order = jnp.cumsum(is_vid, axis=1) - 1  # j-th <video> → row j
    safe = jnp.clip(order, 0, r - 1)
    rows = proj[safe]  # (B, S, D)
    types = (
        replacement_types
        if replacement_types is not None
        else jnp.full((r,), REPLACEMENT_TYPE.INPUT, jnp.int32)
    )
    is_input_type = types[safe] == REPLACEMENT_TYPE.INPUT
    use = is_vid & (order < r) & is_input_type
    return jnp.where(use[..., None], rows.astype(embeds.dtype), embeds)


def splice_audio_inputs(
    params,
    cfg: Any2PixLMConfig,
    input_ids: jax.Array,  # (B, S)
    embeds: jax.Array,  # (B, S, D)
    audio_frames: Optional[jax.Array] = None,  # (B, F, audio_codec_dim)
) -> jax.Array:
    """`extra_inputs` audio path: the j-th `<audio>` token of row b takes
    the projected codec frame `audio_frames[b, j]` (reference
    any2pix_llama.py:311-322 — 8 consecutive `<audio>` tokens per clip).
    Batch-aware: frame ordering restarts per row."""
    if audio_frames is None or audio_frames.shape[1] == 0:
        return embeds
    f = audio_frames.shape[1]
    proj = _projector(params["vae_projector_audio"], audio_frames)  # (B,F,D)
    is_aud = input_ids == cfg.audio_token_id
    order = jnp.cumsum(is_aud, axis=1) - 1  # per-row frame index
    safe = jnp.clip(order, 0, f - 1)
    rows = jnp.take_along_axis(proj, safe[..., None], axis=1)  # (B,S,D)
    use = is_aud & (order < f)
    return jnp.where(use[..., None], rows.astype(embeds.dtype), embeds)


def _train_embeds(params, cfg: Any2PixLMConfig, batch: Dict[str, jax.Array]):
    """Dense training-batch embedding splice (shared by `train_forward`
    and `preview_generations`): token embeds with INPUT-type `<video>`
    rows, gen-target rows, and `<audio>` input frames projected in."""
    ids = batch["input_ids"]
    embeds = llama.embed(params["llama"], ids)
    # INPUT-type <video> splice
    rep_type = batch.get("replacement_type")
    if rep_type is not None:
        is_input = (rep_type == REPLACEMENT_TYPE.INPUT)[..., None]
        proj = _projector(params["vae_projector_image"], batch["replacement_data"])
        embeds = jnp.where(is_input, proj.astype(embeds.dtype), embeds)
    # gen-token splice: <im_gen>/<audio_gen> positions take projected targets
    if "gen_target_image" in batch:
        proj = _projector(params["vae_projector_image"], batch["gen_target_image"])
        embeds = jnp.where(
            batch["gen_mask_image"][..., None], proj.astype(embeds.dtype), embeds
        )
    if "gen_target_audio" in batch:
        proj = _projector(params["vae_projector_audio"], batch["gen_target_audio"])
        embeds = jnp.where(
            batch["gen_mask_audio"][..., None], proj.astype(embeds.dtype), embeds
        )
    # extra_inputs audio: <audio> tokens take projected input-codec frames
    if "extra_audio_frames" in batch:
        embeds = splice_audio_inputs(
            params, cfg, ids, embeds, batch["extra_audio_frames"]
        )
    return embeds


def preview_generations(params, cfg: Any2PixLMConfig, batch: Dict[str, jax.Array]):
    """Training-time generation preview — the `return_generations=True`
    channel (reference any2pix_llama.py:389-395 gathers the predicted
    image encodings at gen positions; trainer.py:248-272 decodes row 0
    and logs a src/gen pair every 50 steps).

    jit-friendly dense form: for each batch row, take the FIRST
    `<im_gen>` position p (argmax of the mask) and return the
    predictor's output at p-1 (the hidden state that predicts target
    p) next to the target row itself.

    Returns dict with `pred` (B, D) predicted image embedding,
    `src` (B, D) the ground-truth codec row at that position, and
    `has_gen` (B,) bool — rows with no image-gen token carry zeros.
    """
    embeds = _train_embeds(params, cfg, batch)
    out = llama.forward(
        params["llama"],
        cfg.llama,
        inputs_embeds=embeds,
        attention_mask=batch.get("attention_mask"),
    )
    hidden = out["hidden_norm"]
    pred_img = _predictor(params["vae_predictor_image"], hidden[:, :-1])
    mask = batch["gen_mask_image"]
    pos = jnp.argmax(mask, axis=1)  # first gen position per row
    # a gen token at position 0 has no preceding hidden state to predict
    # it — treat such rows like the no-gen case instead of pairing
    # pred[0] (which predicts position 1) with src[0]
    has_gen = jnp.any(mask, axis=1) & (pos > 0)
    prev = jnp.clip(pos - 1, 0, pred_img.shape[1] - 1)
    pred = jnp.take_along_axis(pred_img, prev[:, None, None], axis=1)[:, 0]
    src = jnp.take_along_axis(
        batch["gen_target_image"], pos[:, None, None], axis=1
    )[:, 0]
    zero = jnp.zeros_like(pred)
    return {
        "pred": jnp.where(has_gen[:, None], pred, zero),
        "src": jnp.where(has_gen[:, None], src.astype(pred.dtype), zero),
        "has_gen": has_gen,
    }


def train_forward(
    params,
    cfg: Any2PixLMConfig,
    batch: Dict[str, jax.Array],
):
    """Training loss. Dense batch layout (built by train.data collator):

      input_ids, labels, attention_mask: (B, S)
      replacement_data: (B, S, image_codec_dim) — per-position codec
        rows for `<video>` positions (zeros elsewhere)
      replacement_type: (B, S) int — REPLACEMENT_TYPE per position
        (-1 = none)
      gen_target_image: (B, S, image_codec_dim) — continuous target at
        `<im_gen>` positions; gen_mask_image: (B, S) bool
      gen_target_audio / gen_mask_audio: audio analog
    Returns (loss, individual_losses dict).
    """
    ids = batch["input_ids"]
    labels = batch["labels"]
    b, s = ids.shape

    embeds = _train_embeds(params, cfg, batch)
    rep_type = batch.get("replacement_type")

    out = llama.forward(
        params["llama"],
        cfg.llama,
        inputs_embeds=embeds,
        attention_mask=batch.get("attention_mask"),
    )
    logits, hidden = out["logits"], out["hidden_norm"]
    individual = {}

    # LM cross-entropy (shifted). logsumexp-minus-gather form: only the
    # (B,S) reductions materialize in f32 — the full (B,S,V) log-softmax
    # tensor never does (the naive form writes two ~1 GB f32 arrays at
    # batch 4 × 2048 × 32009).
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    lse = jax.scipy.special.logsumexp(shift_logits, axis=-1)
    picked = jnp.take_along_axis(shift_logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = lse - picked
    loss_lang = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
    individual["loss_lang"] = loss_lang
    loss = loss_lang

    # codec heads (reference any2pix_llama.py:377-415): hidden[p-1]
    # predicts target[p]. Continuous latents → MSE × dim; discrete VQ
    # codebooks → plain cross-entropy over codebook logits (the
    # `img_loss_obj == 'ar'` branch; the predictor's out dim is then the
    # codebook vocab size, build_vision_predictor semantics).
    # the image predictor feeds BOTH the continuous image head and
    # loss_extra — run it once over the dense sequence (MXU-friendly),
    # then take masked reductions (was two full predictor forwards)
    need_img_pred = ("gen_target_image" in batch and "gen_index_image" not in batch) or (
        rep_type is not None
    )
    pred_img = (
        _predictor(params["vae_predictor_image"], hidden[:, :-1])
        if need_img_pred
        else None
    )

    def head_loss(pred_fn, target, mask, pred=None):
        pred = pred_fn(hidden[:, :-1]) if pred is None else pred  # (B, S-1, D)
        tgt = target[:, 1:]
        m = mask[:, 1:].astype(jnp.float32)[..., None]
        d = tgt.shape[-1]
        se = jnp.square(pred.astype(jnp.float32) - tgt.astype(jnp.float32)) * m
        denom = jnp.maximum(jnp.sum(m) * d, 1.0)
        return jnp.sum(se) / denom * d  # MSELoss mean × dim

    def ce_head_loss(pred_fn, indices, mask):
        logits = pred_fn(hidden[:, :-1]).astype(jnp.float32)  # (B,S-1,V)
        tgt = indices[:, 1:]
        m = mask[:, 1:].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        safe = jnp.clip(tgt, 0, logits.shape[-1] - 1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)  # no ×dim

    if "gen_index_image" in batch:
        li = ce_head_loss(
            lambda h: _predictor(params["vae_predictor_image"], h),
            batch["gen_index_image"],
            batch["gen_mask_image"],
        )
        individual["loss_img"] = li
        loss = loss + li
    elif "gen_target_image" in batch:
        li = head_loss(
            lambda h: _predictor(params["vae_predictor_image"], h),
            batch["gen_target_image"],
            batch["gen_mask_image"],
            pred=pred_img,
        )
        individual["loss_img"] = li
        loss = loss + li
    if "gen_index_audio" in batch:
        la = ce_head_loss(
            lambda h: _predictor(params["vae_predictor_audio"], h),
            batch["gen_index_audio"],
            batch["gen_mask_audio"],
        )
        individual["loss_aud"] = la
        loss = loss + la
    elif "gen_target_audio" in batch:
        la = head_loss(
            lambda h: _predictor(params["vae_predictor_audio"], h),
            batch["gen_target_audio"],
            batch["gen_mask_audio"],
        )
        individual["loss_aud"] = la
        loss = loss + la

    # loss_extra: L1 at BASE/GEN <video> positions
    if rep_type is not None:
        extra_mask = (rep_type == REPLACEMENT_TYPE.BASE) | (
            rep_type == REPLACEMENT_TYPE.GEN
        )
        pred = pred_img
        m = extra_mask[:, 1:].astype(jnp.float32)[..., None]
        ae = jnp.abs(
            pred.astype(jnp.float32) - batch["replacement_data"][:, 1:].astype(jnp.float32)
        ) * m
        denom = jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)
        loss_extra = jnp.sum(ae) / denom
        individual["loss_extra"] = loss_extra
        loss = loss + loss_extra

    return loss, individual
