"""InstructAny2PixPipeline — the public any-modality-to-image edit API.

API-compatible rebuild of reference pipeline.py:96-411: same entry
points (`__init__(ckpt, llm_folder)`, `forward_llm(inst, mm_data,
use_cache)`, `__call__(inst, mm_data, alpha, h, norm, refinement,
llm_only, num_inference_steps, use_cache, debug, diffusion_mode,
subject_strength, cfg, scale)`), same defaults, same return contracts.

TPU-native differences (behavior-preserving):
  * every stage is a jitted JAX graph — the LLM generates with a KV
    cache (the reference recomputes the full prefix per token,
    pipeline.py:208), the denoise/inversion loops are `lax.scan`s, and
    ImageBind conditioning runs on-device instead of CPU
    (pipeline.py:159-164);
  * models are pure functions over param pytrees; real checkpoints
    import through core.checkpoint converters; without checkpoints the
    pipeline builds deterministic random tiny models (`tiny=True`) so
    the full edit graph stays executable and testable end to end —
    the reference has no equivalent smoke path (SURVEY.md §4).

Stage trace parity (reference §3.1/§3.2 of SURVEY.md):
  forward_llm: ImageBind embeds → ×20 renorm → vicuna_v1 prompt →
  KV-cached sampling (temp 0.3, ≤100 tokens, stop "</s>") →
  `<im_gen>`/`<video>` bookkeeping → vae_predictor readouts → base
  selection (single input shortcut / cosine argmax) → `additions:`
  subject parsing → caption = first "[...]" group.
  __call__: prior (no_diffusion, cfg 10, score 6.5, src norm 100) →
  latent mix h·(base, llm, 20·prior) renorm → DDIM inverse →
  polar interpolate α → IP-Adapter global denoise → refiner
  (strength=refinement) → optional subject consistency.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .codecs import image_io
from .core.prng import KeyChain
from .diffusion import img2img as i2i
from .diffusion import ip_adapter as ipa
from .diffusion import sampler as sampler_lib
from .diffusion.schedulers import Schedule, SchedulerConfig
from .grounding import lib as grounding_lib
from .utils.profiling import stage
from .llm import constants as C
from .llm import generate as gen_lib
from .llm import multimodal as mm_lib
from .llm.conversation import conv_templates
from .llm.clip_tokenizer import load_clip_tokenizer
from .llm.tokenizer import initialize_vision_tokenizer, load_tokenizer
from .models import clip as clip_lib
from .models import imagebind as imagebind_lib
from .models import unet as unet_lib
from .models import vae as vae_lib
from .prior import model as prior_lib

MODALITY = prior_lib.MODALITY
REPLACEMENT_TYPE = C.REPLACEMENT_TYPE

# The reference invokes the SDXL refiner as `self.piperf(image, prompt,
# strength=refinement)` (reference pipeline.py:358) — diffusers'
# StableDiffusionXLImg2ImgPipeline default num_inference_steps=50. The
# refiner step grid is therefore fixed at 50 independent of the edit's
# `num_inference_steps`.
REFINER_NUM_STEPS = 50


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    llm: mm_lib.Any2PixLMConfig = None  # type: ignore[assignment]
    prior: prior_lib.PriorConfig = prior_lib.PriorConfig()
    unet: unet_lib.UNetConfig = unet_lib.UNetConfig.sdxl_base(with_ip=True)
    refiner: unet_lib.UNetConfig = unet_lib.UNetConfig.sdxl_refiner()
    inpaint_unet: unet_lib.UNetConfig = unet_lib.UNetConfig.sdxl_inpaint(with_ip=True)
    vae: vae_lib.VAEConfig = vae_lib.VAEConfig()
    text1: clip_lib.CLIPTextConfig = clip_lib.CLIPTextConfig.vit_l()
    text2: clip_lib.CLIPTextConfig = clip_lib.CLIPTextConfig.open_clip_bigg()
    prior_text: clip_lib.CLIPTextConfig = clip_lib.CLIPTextConfig.vit_h()
    image_proj: ipa.ImageProjConfig = ipa.ImageProjConfig()
    imagebind_vision: imagebind_lib.ViTConfig = imagebind_lib.ViTConfig.imagebind_vision()
    imagebind_audio: imagebind_lib.ViTConfig = imagebind_lib.ViTConfig.imagebind_audio()
    image_size: int = 1024
    embed_norm: float = 20.0
    # >0 enables exact self-speculative GREEDY decoding with an
    # early-exit draft of that many layers (llm/speculative.py): the
    # verify pass is M-flat on the bandwidth-bound int4 matvecs
    # (BASELINE.md r4), so wall-clock improves whenever the draft's
    # acceptance rate clears acceptance·k > 1 + k·L/32. Coerces the
    # LLM to temperature 0 — output is the full model's own argmax
    # sequence, token-identical to plain greedy decode.
    llm_speculative_layers: int = 0
    # grounding model configs — None selects the full-size SwinT/ViT-H
    # graphs inside build_segmentator; the checkpoint-boot test passes
    # tiny-dims configs matching its synthetic gdino/sam checkpoints
    gdino: Optional[Any] = None
    sam: Optional[Any] = None

    @staticmethod
    def tiny() -> "PipelineConfig":
        t1 = clip_lib.CLIPTextConfig.tiny()
        t2 = dataclasses.replace(clip_lib.CLIPTextConfig.tiny(), projection_dim=24)
        tiny_unet = unet_lib.UNetConfig.tiny(with_ip=True)
        ctx = t1.hidden_size + t2.hidden_size  # 64
        unet_cfg = dataclasses.replace(
            tiny_unet,
            cross_attention_dim=ctx,
            projection_class_embeddings_input_dim=24 + 6 * tiny_unet.addition_time_embed_dim,
        )
        inp_cfg = dataclasses.replace(unet_cfg, in_channels=9)
        ref_cfg = dataclasses.replace(
            unet_lib.UNetConfig.tiny(with_ip=False),
            cross_attention_dim=t2.hidden_size,
            projection_class_embeddings_input_dim=24
            + 5 * tiny_unet.addition_time_embed_dim,
            num_time_ids=5,
        )
        return PipelineConfig(
            llm=mm_lib.Any2PixLMConfig.tiny(),
            prior=dataclasses.replace(
                prior_lib.PriorConfig.tiny(),
                embed_dim=16,  # must equal the codec dim so mix_latents works
                output_dim=16,
                imagebind_dim=16,
                text_dim=32,
                gpt2=dataclasses.replace(
                    prior_lib.gpt2.GPT2Config.tiny(), hidden_size=16
                ),
                sequence_input_key=(
                    ("src_type", 0),
                    ("imagebind", 16),
                    ("crossattn_clip", 32),
                    ("score", 8),
                    ("noisy_inputs", 0),
                ),
            ),
            unet=unet_cfg,
            refiner=ref_cfg,
            inpaint_unet=inp_cfg,
            vae=vae_lib.VAEConfig.tiny(),
            text1=t1,
            text2=t2,
            prior_text=dataclasses.replace(clip_lib.CLIPTextConfig.tiny(), hidden_size=32, intermediate_size=64, projection_dim=None),
            image_proj=ipa.ImageProjConfig(cross_attention_dim=ctx, clip_embeddings_dim=16),
            imagebind_vision=imagebind_lib.ViTConfig.tiny(),
            imagebind_audio=dataclasses.replace(
                imagebind_lib.ViTConfig.tiny(in_channels=1), image_size=0
            ),
            image_size=64,
        )


def _audio_patches(cfg, mel_bins: int = 128, frames: int = 204) -> int:
    """Patch count of the audio ViT over the mel grid (stride may
    overlap, ImageBind uses kernel 16 / stride 10)."""
    s, p = cfg.eff_stride, cfg.patch
    return ((mel_bins - p) // s + 1) * ((frames - p) // s + 1)


def _tokenize_pad(tok, text: str, length: int = 77, eos: Optional[int] = None):
    ids = tok.encode(text) if hasattr(tok, "encode") else tok(text).input_ids
    ids = list(ids)[:length]
    if eos is not None and (not ids or ids[-1] != eos) and len(ids) < length:
        ids.append(eos)
    ids = ids + [0] * (length - len(ids))
    return np.asarray([ids], np.int32)


class InstructAny2PixPipeline:
    """Drop-in counterpart of reference `InstructAny2PixPipeline`."""

    def __init__(
        self,
        ckpt: str = "ckpts",
        llm_folder: str = "llm-retrained",
        tiny: Optional[bool] = None,
        seed: int = 0,
        config: Optional[PipelineConfig] = None,
        params: Optional[Any] = None,
    ):
        """`params` overrides checkpoint loading with a caller-provided
        param mapping — e.g. a `core.staging.StagedParams` store so the
        full-size stack runs on one 16 GB chip with LRU weight staging
        (the single-chip counterpart of the reference's fp16+NF4
        single-GPU squeeze, reference pipeline.py:30,101)."""
        from . import loaders as loaders_lib

        # converted orbax roots (scripts/convert_checkpoints.py) are a
        # valid checkpoint source too — the warm-boot path that skips
        # torch parsing and LLM re-quantization
        has_ckpts = os.path.isdir(
            os.path.join(ckpt, llm_folder)
        ) or loaders_lib.is_converted_root(ckpt)
        if tiny is None:
            tiny = not has_ckpts and params is None
        self.tiny = tiny
        self.cfg = config or (PipelineConfig.tiny() if tiny else PipelineConfig())
        if self.cfg.llm is None:
            self.cfg = dataclasses.replace(self.cfg, llm=mm_lib.Any2PixLMConfig())
        self.schedule = Schedule.create(SchedulerConfig())
        self.cache = None
        # jitted stage graphs, keyed by (stage, static knobs) — the
        # product path dispatches ONE graph per stage (scans included)
        # instead of per-op eager calls; reused across __call__s
        self._jitted: Dict[Any, Any] = {}

        self.tokenizer = load_tokenizer(
            os.path.join(ckpt, llm_folder, "tokenizer") if has_ckpts else None
        )
        self.token_ids = initialize_vision_tokenizer(self.tokenizer)
        if tiny:
            self.cfg = dataclasses.replace(
                self.cfg, llm=mm_lib.Any2PixLMConfig.tiny(self.token_ids)
            )

        kc = KeyChain(seed)
        if params is not None:
            self.params = params
            # a store aliasing inpaint_unet -> unet means the base UNet
            # serves inpainting (reference pipeline.py:132-139 shares
            # base components): pin the config to the 4-channel path
            resolve = getattr(params, "_resolve", None)
            if resolve is not None and resolve("inpaint_unet") == "unet":
                self.cfg = dataclasses.replace(self.cfg, inpaint_unet=self.cfg.unet)
        elif tiny:
            self.params = self._init_random(kc)
        else:
            self.params = self._load_checkpoints(ckpt, llm_folder)

        # CLIP BPE tokenizers for the SDXL text encoders and the prior's
        # CLIP-ViT-H conditioner (reference prior/model.py:29-44;
        # diffusers SDXL tokenizer/tokenizer_2). Loaded from checkpoint
        # dirs when present; checkpoint-free tiny runs keep the byte
        # tokenizer (the tiny text encoders are random anyway).
        sdxl_dir = os.path.join(ckpt, "sdxl-base")
        self.clip_tok1 = load_clip_tokenizer(os.path.join(sdxl_dir, "tokenizer"))
        self.clip_tok2 = load_clip_tokenizer(os.path.join(sdxl_dir, "tokenizer_2"))
        self.prior_tok = load_clip_tokenizer(
            os.path.join(ckpt, "clip-vit-h", "tokenizer")
        ) or load_clip_tokenizer(os.path.join(ckpt, "clip-vit-h"))

        # grounding components: real GroundingDINO+SAM graphs when their
        # checkpoints exist (reference gdino/lib.py:54-67 wires them at
        # init); whole-image cosine fallback otherwise
        self.segmentor, self.grounder = grounding_lib.build_segmentator(
            os.path.join(ckpt, "gdino"),
            sam_cfg=self.cfg.sam, dino_cfg=self.cfg.gdino,
        )

    # ------------------------------------------------------------ weights

    def _init_random(self, kc: KeyChain) -> Dict[str, Any]:
        c = self.cfg
        return {
            "llm": mm_lib.init(kc(), c.llm),
            "prior": prior_lib.init(kc(), c.prior),
            "unet": unet_lib.init(kc(), c.unet),
            "refiner": unet_lib.init(kc(), c.refiner),
            "inpaint_unet": unet_lib.init(kc(), c.inpaint_unet),
            "vae": vae_lib.init(kc(), c.vae),
            "text1": clip_lib.text_init(kc(), c.text1),
            "text2": clip_lib.text_init(kc(), c.text2),
            "prior_text": clip_lib.text_init(kc(), c.prior_text),
            "image_proj": ipa.init(kc(), c.image_proj),
            "imagebind_vision": imagebind_lib.init(kc(), c.imagebind_vision),
            "imagebind_audio": imagebind_lib.init(
                kc(), c.imagebind_audio, num_patches=_audio_patches(c.imagebind_audio)
            ),
        }

    def _load_checkpoints(self, ckpt: str, llm_folder: str) -> Dict[str, Any]:
        from .loaders import load_pipeline_params

        params = load_pipeline_params(self.cfg, ckpt, llm_folder)
        # the loaded tree shares the BASE UNet for inpainting (reference
        # pipeline.py:132-139 builds StableDiffusionXLInpaintPipeline
        # from base components) — pin the inpaint config to match so the
        # 4-channel latent-blend path runs (diffusers num_channels_unet
        # == 4 branch), not the dedicated 9-channel concat path
        self.cfg = dataclasses.replace(self.cfg, inpaint_unet=self.cfg.unet)
        return params

    # ------------------------------------------------------------ jitting

    def _jit(self, key: Any, make) -> Any:
        """One persistent jitted graph per (stage, static-knob) key.
        `make` builds the traceable closure on first use; the compiled
        executable is reused across edits (jax caches by arg shapes
        under the hood, so prompt-length changes recompile only the
        affected stage)."""
        fn = self._jitted.get(key)
        if fn is None:
            fn = self._jitted[key] = jax.jit(make())
        return fn

    # -------------------------------------------------------- conditioning

    def _embed_media(self, item: dict) -> jax.Array:
        """One mm_data entry → 1024-d ImageBind-space embedding. Accepts
        precomputed embeddings under 'embed' (the npz feature path) or
        raw files under 'fname'."""
        if "embed" in item:
            e = jnp.asarray(np.asarray(item["embed"], np.float32)).reshape(1, -1)
            return e
        fpath = item["fname"]
        from .utils.filecache import cached

        if item["type"] == "image":
            c = self.cfg.imagebind_vision
            fn = self._jit(
                "ib_vision", lambda: lambda p, x: imagebind_lib.apply(p, x, c)
            )
            x = jnp.asarray(
                cached(
                    fpath, ("ib_vis", c.image_size or 224),
                    lambda: imagebind_lib.preprocess_vision(
                        image_io.load_image(fpath), c.image_size or 224
                    ),
                )
            )
            return fn(self.params["imagebind_vision"], x)
        if item["type"] == "audio":
            c = self.cfg.imagebind_audio
            fn = self._jit(
                "ib_audio",
                lambda: lambda p, x: jnp.mean(
                    imagebind_lib.apply(p, x, c), axis=0, keepdims=True
                ),
            )
            clips = jnp.asarray(
                cached(
                    fpath, "ib_aud",
                    lambda: imagebind_lib.preprocess_audio(_load_wav(fpath)),
                )
            )
            return fn(self.params["imagebind_audio"], clips)
        raise ValueError(item["type"])

    # ---------------------------------------------------------- LLM stage

    def forward_llm(
        self,
        inst: str,
        mm_data: List[dict] = [],
        use_cache: bool = False,
        key: Optional[jax.Array] = None,
    ):
        if use_cache and self.cache is not None:
            return self.cache

        with stage("imagebind_encode"):
            aux_info = self.embed_mm_data(mm_data)

        input_ids, inputs_embeds = self._prepare_llm_inputs(inst, aux_info)
        eos_id = getattr(self.tokenizer, "eos_token_id", 2)
        if self.cfg.llm_speculative_layers > 0:
            from .llm import speculative as spec_lib

            with stage("llm_generate"):
                result = spec_lib.generate_speculative(
                    self.params["llm"]["llama"],
                    self.cfg.llm.llama,
                    inputs_embeds,
                    max_new_tokens=100,
                    eos_id=eos_id,
                    draft_layers=self.cfg.llm_speculative_layers,
                )
            n_out = min(int(result.done_at[0]) + 1, result.tokens.shape[1])
            out = self._postprocess_llm(
                np.asarray(result.tokens[0, :n_out]), result.hiddens[0, :n_out],
                input_ids, aux_info, mm_data,
            )
            self.cache = out
            return out
        with stage("llm_generate"):
            result = gen_lib.generate(
                self.params["llm"]["llama"],
                self.cfg.llm.llama,
                inputs_embeds,
                key if key is not None else jax.random.key(np.random.randint(0, 2**31)),
                max_new_tokens=100,
                temperature=0.3,
                eos_id=eos_id,
                bucket=64,  # bound compile count across prompt lengths
                # interactive path: stop decoding at EOS instead of
                # paying all 100 steps (serving.PipelineServer keeps the
                # fixed-length scan for predictable batch cost)
                dynamic_stop=True,
            )
        n_out = min(int(result.done_at[0]) + 1, result.tokens.shape[1])
        out = self._postprocess_llm(
            np.asarray(result.tokens[0, :n_out]), result.hiddens[0, :n_out],
            input_ids, aux_info, mm_data,
        )
        self.cache = out
        return out

    def _prepare_llm_inputs(self, inst: str, aux_info: jax.Array):
        """instruction + conditioning embeds → (input_ids, spliced
        embeds) — the pre-generate half of forward_llm, reusable by the
        batched server."""
        conv = conv_templates["vicuna_v1"].copy()
        conv.append_message(conv.roles[0], inst)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()
        input_ids = np.asarray([self.tokenizer(prompt).input_ids], np.int64)
        types = jnp.full((aux_info.shape[0],), REPLACEMENT_TYPE.INPUT, jnp.int32)
        inputs_embeds = mm_lib.splice_input_embeds(
            self.params["llm"], self.cfg.llm, jnp.asarray(input_ids), aux_info, types
        )
        return input_ids, inputs_embeds

    def embed_mm_data(self, mm_data: List[dict]) -> jax.Array:
        """mm_data → renormed (N, D) conditioning matrix (aux_info)."""
        embeds = [self._embed_media(r) for r in mm_data]
        aux_info = (
            jnp.concatenate(embeds, axis=0)
            if embeds
            else jnp.zeros((0, self.cfg.llm.image_codec_dim))
        )
        return (
            aux_info
            / (jnp.linalg.norm(aux_info, axis=-1, keepdims=True) + 1e-9)
            * self.cfg.embed_norm
        )

    def _postprocess_llm(self, out_seq, hiddens, input_ids, aux_info, mm_data):
        """Token bookkeeping after generation (reference
        pipeline.py:213-279): gen-token location, predictor readouts,
        base selection, subject parsing, caption extraction."""
        full_text = self.tokenizer.decode(
            list(input_ids[0]) + list(out_seq)
        )

        vid_id = self.token_ids[C.DEFAULT_VIDEO_TOKEN]
        im_gen_id = self.token_ids[C.DEFAULT_IM_GEN_TOKEN]
        base_id = self.token_ids[C.DEFAULT_BASE_TOKEN]

        im_gen_pos = np.where(out_seq == im_gen_id)[0]
        all_gen = np.empty((0,), np.int64)
        if len(im_gen_pos):
            im_gem_idx = im_gen_pos[-1]
            all_gen = np.where(out_seq == vid_id)[0]
            all_gen = all_gen[all_gen > im_gem_idx]
        if len(all_gen) == 0:
            # no usable generation tokens — caption-only fallback,
            # reference pipeline.py:217-221
            caption = full_text.split("ASSISTANT:")[-1]
            return None, None, caption, None, None
        gen_idx = int(all_gen[0])
        remaining = all_gen[1:]

        pred_fn = self._jit(
            "pred_img", lambda: mm_lib.predict_image_embedding
        )
        image_embeds = np.asarray(
            pred_fn(self.params["llm"], hiddens[gen_idx][None])
        )
        extra_embeds = (
            np.concatenate(
                [
                    np.asarray(pred_fn(self.params["llm"], hiddens[int(i)][None]))
                    for i in remaining
                ]
            )
            if len(remaining)
            else np.zeros((0, image_embeds.shape[-1]), np.float32)
        )

        aux_np = np.asarray(aux_info)
        if len(mm_data) == 1:
            base_idx = 0
            base_embed = aux_np[0]
        else:
            base_pos = np.where(out_seq == base_id)[0]
            if len(base_pos) and base_pos[0] + 1 < len(out_seq):
                h_base = hiddens[int(base_pos[0]) + 1][None]
                base_pred = np.asarray(pred_fn(self.params["llm"], h_base))[0]
                sims = (
                    base_pred / (np.linalg.norm(base_pred) + 1e-9) * self.cfg.embed_norm
                ) @ aux_np.T
                base_idx = int(np.argmax(sims))
                # multi-input: the reference RETURNS the predicted base
                # embedding itself (pipeline.py:256-260) — the cosine
                # argmax only picks the source FILE
                base_embed = base_pred
            else:
                base_idx = 0
                base_embed = aux_np[base_idx] if len(aux_np) else np.zeros_like(image_embeds[0])
        base_img_path = mm_data[base_idx]["fname"] if mm_data else None

        all_objs = self.get_all_objs(full_text)
        if len(all_objs) != len(extra_embeds):
            all_objs = []
        extra_idx: Any = []
        if all_objs:
            sims = (
                extra_embeds
                / (np.linalg.norm(extra_embeds) + 1e-9)
                * self.cfg.embed_norm
            ) @ aux_np.T
            extra_idx = np.argmax(sims, axis=1)
            extra_embeds = aux_np[extra_idx]

        caption_groups = re.findall(r"\[([^\]]+)\]", full_text)
        output_caption = caption_groups[0] if caption_groups else full_text.split("ASSISTANT:")[-1]
        extra_data = dict(all_objs=all_objs, extra_embeds=extra_embeds, extra_idx=extra_idx)
        return (
            jnp.asarray(image_embeds),
            jnp.asarray(base_embed),
            output_caption,
            base_img_path,
            extra_data,
        )

    @staticmethod
    def get_all_objs(s: str) -> List[str]:
        """Parse `additions:<name>:<video>.` subject suffix (reference
        pipeline.py:281-287)."""
        # the reference anchors on a trailing `</s>`; HF tokenizers with
        # skip_special_tokens semantics may strip it, so end-of-string is
        # an accepted terminator too
        matched = re.findall(r"additions:(.*?)(?:\</s\>|$)", s, re.DOTALL)
        if not matched or not matched[0]:
            return []
        return re.findall(r"([^:]+):<video>", matched[0])

    # -------------------------------------------------------- helpers

    def _clip_ids(self, clip_tok, prompt: str, length: int, eos: Optional[int]):
        """Token ids for a CLIP text encoder: the real BPE tokenizer when
        its vocab is on disk, byte-tokenizer fallback otherwise."""
        if clip_tok is not None:
            return np.asarray([clip_tok.encode_padded(prompt, length)], np.int32)
        return _tokenize_pad(self.tokenizer, prompt, length, eos)

    def _encode_sdxl_prompt(self, prompt: str):
        c = self.cfg
        ids1 = self._clip_ids(self.clip_tok1, prompt, c.text1.max_positions, c.text1.eos_token_id)
        ids2 = self._clip_ids(self.clip_tok2, prompt, c.text2.max_positions, c.text2.eos_token_id)
        fn = self._jit(
            "sdxl_prompt",
            lambda: lambda t1, t2, i1, i2: sampler_lib.encode_prompt_sdxl(
                t1, c.text1, t2, c.text2, i1, i2
            ),
        )
        return fn(
            self.params["text1"], self.params["text2"],
            jnp.asarray(ids1), jnp.asarray(ids2),
        )

    def _encode_prior_text(self, prompt: str = ""):
        c = self.cfg
        ids = self._clip_ids(
            self.prior_tok, prompt, c.prior.text_len, c.prior_text.eos_token_id
        )
        fn = self._jit(
            "prior_text",
            lambda: lambda p, i: clip_lib.text_apply(p, i, c.prior_text)[
                "last_hidden_state"
            ],
        )
        out = {"last_hidden_state": fn(self.params["prior_text"], jnp.asarray(ids))}
        # the reference tokenizes with padding=True (batch-longest), so
        # only the real tokens enter the prior's sequence assembly
        # (reference prior/model.py:84-104 returns the true attention
        # mask; "== 1 means usable token"). CLIP is causal, so masking
        # the pad positions here is exactly equivalent.
        eos = c.prior_text.eos_token_id
        arr = np.asarray(ids)[0]
        hits = np.nonzero(arr == eos)[0] if eos is not None else []
        n = int(hits[0]) + 1 if len(hits) else arr.shape[0]
        mask = (np.arange(arr.shape[0]) < n).astype(np.float32)[None]
        return out["last_hidden_state"], jnp.asarray(mask)

    def loas_base_img(self, base_img_path):  # reference name preserved
        return self.load_base_img(base_img_path)

    def load_base_img(self, base_img_path) -> np.ndarray:
        from .utils.filecache import cached

        if isinstance(base_img_path, (str, bytes)):
            return cached(
                base_img_path, ("base", self.cfg.image_size),
                lambda: image_io.resize_and_crop(
                    base_img_path, self.cfg.image_size
                ),
            )
        return image_io.resize_and_crop(base_img_path, self.cfg.image_size)

    def polar_intrtpolate(self, x, y, alpha):  # reference name preserved
        return sampler_lib.polar_interpolate(x, y, alpha)

    # ------------------------------------------------------------ text2img

    def text2img(
        self,
        prompt: str,
        negative_prompt: str = "",
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: int = 0,
        ip_embeds: Optional[np.ndarray] = None,
        ip_scale: float = 1.0,
    ) -> np.ndarray:
        """Plain SDXL text-to-image generation — the live counterpart of
        the reference's vendored StableDiffusionXLPipeline fork
        (reference ddim/sdxl_pipeline.py:544-889, a pinned diffusers
        copy shadowed on import): dual-text-encoder prompt embedding,
        CFG denoise from Gaussian noise on the SDXL schedule, VAE
        decode. `ip_embeds` optionally conditions through the
        IP-Adapter (global mode) like IPAdapterXL.generate without an
        init image."""
        c = self.cfg
        kc = KeyChain(seed)
        ctx_p, pooled_p = self._encode_sdxl_prompt(prompt)
        ctx_n, pooled_n = self._encode_sdxl_prompt(negative_prompt)
        tid = sampler_lib.default_time_ids(c.image_size, c.image_size, 1)
        # VAE spatial factor: 2^(levels-1) — 8 for SDXL, derived so tiny
        # configs decode back to cfg.image_size
        h = c.image_size // (2 ** (len(c.vae.block_out_channels) - 1))
        # DDIM init_noise_sigma == 1.0 (diffusers) — raw Gaussian start
        lat = jax.random.normal(kc(), (1, h, h, 4))
        ip_cond = ip_uncond = None
        if ip_embeds is not None:
            ip_embed_fn = self._jit(
                "ip_embeds_global",
                lambda: lambda p, e: ipa.get_image_embeds(
                    p, c.image_proj, clip_image_embeds=e, mode="global"
                ),
            )
            ip_cond, ip_uncond = ip_embed_fn(
                self.params["image_proj"], jnp.asarray(ip_embeds).reshape(1, -1)
            )
        t2i_fn = self._jit(
            ("t2i", num_inference_steps, guidance_scale, ip_scale,
             ip_embeds is not None),
            lambda: lambda p, lat, ctx_p, ctx_n, pooled_p, pooled_n, tid, ip,
            ip_u: sampler_lib.denoise(
                p, c.unet, self.schedule, lat, ctx_p, ctx_n, pooled_p,
                pooled_n, tid, num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, ip_tokens=ip,
                ip_tokens_uncond=ip_u, ip_scale=ip_scale,
            ),
        )
        lat = t2i_fn(
            self.params["unet"], lat, ctx_p, ctx_n, pooled_p, pooled_n, tid,
            ip_cond, ip_uncond,
        )
        vae_dec = self._jit(
            "vae_dec", lambda: lambda p, z: vae_lib.decode(p, z, c.vae)
        )
        img = vae_dec(self.params["vae"], lat)
        return image_io.from_model_range(np.asarray(img[0]))

    # ------------------------------------------------------------- __call__

    def __call__(
        self,
        inst: str,
        mm_data: List[dict],
        alpha: float = 0.7,
        h: Tuple[float, float, float] = (0.0, 0.4, 1.0),
        norm: float = 20.0,
        refinement: float = 0.5,
        llm_only: bool = False,
        num_inference_steps: int = 25,
        use_cache: bool = False,
        debug: bool = False,
        diffusion_mode: str = "default",
        subject_strength: float = 0.0,
        cfg: float = 10,
        scale: float = 1.0,
        seed: Optional[int] = None,
    ) -> Any:
        c = self.cfg
        kc = KeyChain(seed if seed is not None else np.random.randint(0, 2**31))

        # seed discipline: the `seed` kwarg drives every sampling site,
        # including the LLM's — same seed ⇒ identical edit (the
        # reference's torch.manual_seed contract, serve.py:40)
        image_embeds, base_embed, output_caption, base_img_path, extra_data = (
            self.forward_llm(inst, mm_data, use_cache=use_cache, key=kc())
        )
        self.cache = (image_embeds, base_embed, output_caption, base_img_path, extra_data)
        if llm_only or image_embeds is None:
            return None, None, output_caption

        # prior refinement (reference pipeline.py:313-317)
        th, tm = self._encode_prior_text("")
        src = image_embeds / (jnp.linalg.norm(image_embeds) + 1e-9) * 100.0
        prior_fn = self._jit(
            "prior",
            lambda: lambda p, s, th, tm: prior_lib.generate_diffusion(
                p, c.prior, MODALITY.VIDEO, MODALITY.IMAGE, s, th, tm,
                guidance_scale=10.0, score=6.5, no_diffusion=True,
            )[:, 0],
        )
        with stage("prior"):
            y = prior_fn(self.params["prior"], src.reshape(1, -1), th, tm)

        img_base = self.load_base_img(base_img_path)

        latent_la = sampler_lib.mix_latents(
            base_embed.reshape(1, -1), image_embeds.reshape(1, -1),
            y / (jnp.linalg.norm(y) + 1e-9), h, norm,
        )

        # DDIM inversion of the base image (reference pipeline.py:330)
        vae_enc = self._jit(
            "vae_enc", lambda: lambda p, x, k: vae_lib.encode(p, x, key=k, cfg=c.vae)
        )
        x = jnp.asarray(image_io.to_model_range(img_base))[None]
        src_lat = vae_enc(self.params["vae"], x, kc())
        ctx_null, pooled_null = self._encode_sdxl_prompt("")
        tid = sampler_lib.default_time_ids(c.image_size, c.image_size, 1)
        invert_fn = self._jit(
            ("invert", num_inference_steps),
            lambda: lambda p, lat, ctx, pooled, tid: sampler_lib.ddim_invert(
                p, c.unet, self.schedule, lat, ctx, pooled, tid,
                num_inference_steps=num_inference_steps,
            ),
        )
        with stage("ddim_inversion"):
            latent_inv = invert_fn(
                self.params["unet"], src_lat, ctx_null, pooled_null, tid
            )
        polar_fn = self._jit(
            "polar",
            lambda: lambda x, y, a: sampler_lib.polar_interpolate(x, y, a),
        )
        latent_inv = polar_fn(
            latent_inv, jax.random.normal(kc(), latent_inv.shape), alpha
        )

        # IP-Adapter global-mode generation (reference pipeline.py:342-354)
        prompt = "best quality, high quality" + output_caption
        ctx_p, pooled_p = self._encode_sdxl_prompt(prompt)
        ip_embed_fn = self._jit(
            "ip_embeds_global",
            lambda: lambda p, e: ipa.get_image_embeds(
                p, c.image_proj, clip_image_embeds=e, mode="global"
            ),
        )
        ip_cond, ip_uncond = ip_embed_fn(self.params["image_proj"], latent_la)
        with stage("denoise"):
            if diffusion_mode == "ipa_lcm":
                # 4-step LCM fast path (reference readme.MD:60; needs
                # LCM-distilled UNet weights for quality)
                from .diffusion.schedulers import lcm_timesteps

                def make_lcm():
                    def fn(p, lat, ctx_p, ctx_n, pooled_p, pooled_n, tid,
                           ip, ip_u, k):
                        eps_fn = sampler_lib.make_cfg_eps_fn(
                            p, c.unet, ctx_p, ctx_n, pooled_p, pooled_n, tid,
                            guidance_scale=1.0, ip_tokens=ip,
                            ip_tokens_uncond=ip_u, ip_scale=scale,
                        )
                        return sampler_lib.scan_denoise_lcm(
                            eps_fn, self.schedule, lat,
                            lcm_timesteps(self.schedule, 4), k,
                        )

                    return fn

                lat = self._jit(("lcm_denoise", scale), make_lcm)(
                    self.params["unet"], latent_inv, ctx_p, ctx_null,
                    pooled_p, pooled_null, tid, ip_cond, ip_uncond, kc(),
                )
            else:
                denoise_fn = self._jit(
                    ("denoise", num_inference_steps, cfg, scale),
                    lambda: lambda p, lat, ctx_p, ctx_n, pooled_p, pooled_n,
                    tid, ip, ip_u: sampler_lib.denoise(
                        p, c.unet, self.schedule, lat, ctx_p, ctx_n,
                        pooled_p, pooled_n, tid,
                        num_inference_steps=num_inference_steps,
                        guidance_scale=cfg, ip_tokens=ip,
                        ip_tokens_uncond=ip_u, ip_scale=scale,
                    ),
                )
                lat = denoise_fn(
                    self.params["unet"], latent_inv, ctx_p, ctx_null,
                    pooled_p, pooled_null, tid, ip_cond, ip_uncond,
                )
        vae_dec = self._jit(
            "vae_dec", lambda: lambda p, z: vae_lib.decode(p, z, c.vae)
        )
        img = vae_dec(self.params["vae"], lat)
        non_refined = image_io.from_model_range(np.asarray(img[0]))

        # refiner (reference pipeline.py:358-359)
        if refinement > 0:
            text2_fn = self._jit(
                "text2_apply",
                lambda: lambda p, i: clip_lib.text_apply(p, i, c.text2),
            )
            rprompt = output_caption + ",high quality,well-formed,award-winning"
            ids2 = self._clip_ids(
                self.clip_tok2, rprompt, c.text2.max_positions, c.text2.eos_token_id
            )
            o2 = text2_fn(self.params["text2"], jnp.asarray(ids2))
            rctx = o2["hidden_states"][-2]
            rpooled = o2.get("text_embeds", o2["pooled"])
            ids2n = self._clip_ids(
                self.clip_tok2, "", c.text2.max_positions, c.text2.eos_token_id
            )
            o2n = text2_fn(self.params["text2"], jnp.asarray(ids2n))
            # refiner time ids include the aesthetic score as 5th entry
            # (diffusers _get_add_time_ids: 6.0 cond / 2.5 uncond)
            rtid = jnp.asarray(
                [[c.image_size, c.image_size, 0, 0, 6.0]], jnp.float32
            )
            rtid_u = jnp.asarray(
                [[c.image_size, c.image_size, 0, 0, 2.5]], jnp.float32
            )
            rlat = vae_enc(
                self.params["vae"],
                jnp.asarray(image_io.to_model_range(non_refined))[None],
                kc(),
            )
            refiner_fn = self._jit(
                ("refiner", refinement),
                lambda: lambda p, lat, k, ctx, ctx_n, pooled, pooled_n, tid,
                tid_u: i2i.img2img(
                    p, c.refiner, self.schedule, lat, k, ctx, ctx_n, pooled,
                    pooled_n, tid,
                    # reference calls the refiner with diffusers defaults
                    # (pipeline.py:358): num_inference_steps=50 and
                    # guidance 5.0 regardless of the edit's step count —
                    # strength 0.5 means ~25 refiner steps on a 50-step
                    # grid, NOT steps/2 on the edit grid.
                    num_inference_steps=REFINER_NUM_STEPS,
                    strength=refinement, guidance_scale=5.0,
                    time_ids_uncond=tid_u,
                ),
            )
            with stage("refiner"):
                rlat = refiner_fn(
                    self.params["refiner"], rlat, kc(), rctx,
                    o2n["hidden_states"][-2], rpooled,
                    o2n.get("text_embeds", o2n["pooled"]), rtid, rtid_u,
                )
            rimg = vae_dec(self.params["vae"], rlat)
            oo = image_io.from_model_range(np.asarray(rimg[0]))
        else:
            oo = non_refined

        an = None
        subject_data = []
        if subject_strength > 0 and len(extra_data["extra_idx"]) > 0:
            subject_data = [
                {"name": k, "embed": v}
                for (k, v, i) in zip(
                    extra_data["all_objs"],
                    extra_data["extra_embeds"],
                    extra_data["extra_idx"],
                )
                if mm_data[int(i)]["type"] == "image"
            ]
            oo, an = grounding_lib.subject_consistency(
                subject_data, output_caption, oo, self.segmentor, self.grounder,
                self._make_inpaint_fn(kc, num_inference_steps, subject_strength),
                subject_strength,
            )

        if not debug:
            msg: Any = "SUCCESS!"
        else:
            # attention-map tap (reference ip_adapter/utils.py:7-59 +
            # attention_processor.py:169): one extra conditioned UNet
            # forward at the final latent captures per-layer IP attention
            # probs; aggregated like the reference's get_net_attn_map
            _, attn_taps = unet_lib.apply(
                self.params["unet"], lat, jnp.zeros((1,), jnp.int32), ctx_p,
                c.unet, pooled_text=pooled_p, time_ids=tid,
                ip_tokens=ip_cond, ip_scale=scale, capture_ip_attn=True,
            )
            attn_maps = ipa.aggregate_attn_maps(
                attn_taps, (c.image_size, c.image_size), batch_index=0
            )
            msg = dict(
                attn_maps=attn_maps,
                output_caption=output_caption,
                latent_inv=latent_inv,
                img_base=img_base,
                latent_la=latent_la,
                base_embed=base_embed,
                annotations=an,
                subjec_data=subject_data,  # reference key name preserved
                y=y / (jnp.linalg.norm(y) + 1e-9),
            )
        return non_refined, oo, msg

    def _make_inpaint_fn(self, kc: KeyChain, steps: int, strength: float):
        c = self.cfg

        vae_enc = self._jit(
            "vae_enc", lambda: lambda p, x, k: vae_lib.encode(p, x, key=k, cfg=c.vae)
        )
        vae_dec = self._jit(
            "vae_dec", lambda: lambda p, z: vae_lib.decode(p, z, c.vae)
        )

        def inpaint_fn(image: np.ndarray, mask: np.ndarray, subject_embed, prompt: str):
            x = jnp.asarray(image_io.to_model_range(image))[None]
            lat = vae_enc(self.params["vae"], x, kc())
            masked = x * (1.0 - jnp.asarray(mask)[None, :, :, None])
            masked_lat = vae_enc(self.params["vae"], masked, kc())
            ctx_p, pooled_p = self._encode_sdxl_prompt(prompt)
            ctx_n, pooled_n = self._encode_sdxl_prompt("")
            tid = sampler_lib.default_time_ids(c.image_size, c.image_size, 1)
            ip_embed_fn = self._jit(
                "ip_embeds_local",
                lambda: lambda p, e: ipa.get_image_embeds(
                    p, c.image_proj, clip_image_embeds_local=e, mode="local"
                ),
            )
            ip_cond, ip_uncond = ip_embed_fn(
                self.params["image_proj"],
                jnp.asarray(subject_embed).reshape(1, -1),
            )
            inpaint_jit = self._jit(
                ("inpaint", strength),
                lambda: lambda p, lat, m, mlat, k, ctx_p, ctx_n, pooled_p,
                pooled_n, tid, ip, ip_u: i2i.inpaint(
                    p, c.inpaint_unet, self.schedule, lat, m, mlat, k,
                    ctx_p, ctx_n, pooled_p, pooled_n, tid,
                    num_inference_steps=50, strength=strength,
                    guidance_scale=7.5, ip_tokens=ip, ip_tokens_uncond=ip_u,
                    ip_scale=0.8,
                ),
            )
            out = inpaint_jit(
                self.params["inpaint_unet"], lat,
                jnp.asarray(mask)[None, :, :, None], masked_lat, kc(),
                ctx_p, ctx_n, pooled_p, pooled_n, tid, ip_cond, ip_uncond,
            )
            img = vae_dec(self.params["vae"], out)
            return image_io.from_model_range(np.asarray(img[0]))

        return inpaint_fn


def _resample_linear(data: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Linear-interpolation resample (mono). ffmpeg's soxr does better
    anti-aliasing; for the 1024-d ImageBind embedding downstream the
    difference is negligible, and this keeps plain-WAV inputs decodable
    with zero external dependencies."""
    if sr == target_sr or data.size == 0:
        return data
    n_out = int(round(data.size * target_sr / sr))
    xp = np.arange(data.size, dtype=np.float64) / sr
    x = np.arange(n_out, dtype=np.float64) / target_sr
    return np.interp(x, xp, data).astype(np.float32)


def _decode_wav(path: str) -> Tuple[np.ndarray, int]:
    import wave

    with wave.open(path) as w:
        frames = w.readframes(w.getnframes())
        dtype = {1: np.int8, 2: np.int16, 4: np.int32}[w.getsampwidth()]
        data = np.frombuffer(frames, dtype=dtype).astype(np.float32)
        data /= float(np.iinfo(dtype).max)
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(axis=1)
        return data, w.getframerate()


def _load_wav(path: str, target_sr: int = 16000) -> np.ndarray:
    """Audio decode for mm_data entries, resampled to `target_sr`
    (ImageBind's 16 kHz): .npy passthrough (precomputed at target
    rate), WAV via the stdlib, and any other format (mp3/flac/ogg/mp4
    audio) through an ffmpeg subprocess exactly like the reference
    (reference vae/modules/extract_spec.py:193-209)."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".wav"):
        data, sr = _decode_wav(path)
        return _resample_linear(data, sr, target_sr)
    # compressed container → ffmpeg -f wav -ac 1 -ar target_sr
    import shutil
    import subprocess
    import tempfile

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            f"cannot decode {path!r}: not .wav/.npy and no ffmpeg on PATH "
            "(the reference uses ffmpeg for compressed audio, "
            "extract_spec.py:193-209)"
        )
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "decoded.wav")
        subprocess.run(
            [ffmpeg, "-i", path, "-hide_banner", "-loglevel", "panic",
             "-f", "wav", "-vn", "-ac", "1", "-ar", str(target_sr), "-y", out],
            check=True,
        )
        data, sr = _decode_wav(out)
    return _resample_linear(data, sr, target_sr)


# JSON helpers (reference pipeline.py:388-411)
def load_json(fp):
    import json

    with open(fp) as f:
        return json.loads(f.read())


def dump_json(obj, fp):
    import json

    with open(fp, "w") as f:
        f.write(json.dumps(obj))


def preprocess_mm_data(mm_data):
    """Normalize user mm_data entries to {type, fname} dicts."""
    out = []
    for r in mm_data:
        if isinstance(r, dict):
            out.append(r)
        else:
            t = "audio" if str(r).endswith((".wav", ".mp3", ".flac")) else "image"
            out.append({"type": t, "fname": r})
    return out
