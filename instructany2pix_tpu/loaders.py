"""Full-scale checkpoint loading for the pipeline.

Maps the reference's on-disk checkpoint layout (reference
pipeline.py:96-147: `ckpts/<llm_folder>` HF dir, `ckpts/prior/model.bin`,
SDXL diffusers dirs, `ckpts/sdxl/ip_adapter_global_local_2_view.bin`,
`ckpts/imagebind_huge.pth`) into this framework's param pytrees via the
per-model converters.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict

import numpy as np

from .core import checkpoint as ckpt_lib
from .diffusion import ip_adapter as ipa
from .models import clip as clip_lib
from .models import gpt2 as gpt2_lib
from .models import llama as llama_lib


def _load_sharded_hf(path: str) -> Dict[str, np.ndarray]:
    """Load all .safetensors/.bin shards in an HF checkpoint dir."""
    sd: Dict[str, np.ndarray] = {}
    files = sorted(
        glob.glob(os.path.join(path, "*.safetensors"))
        or glob.glob(os.path.join(path, "pytorch_model*.bin"))
        # diffusers component dirs (unet/vae) use this name in .bin format
        or glob.glob(os.path.join(path, "diffusion_pytorch_model*.bin"))
    )
    if not files:
        raise FileNotFoundError(f"no weight shards under {path}")
    for f in files:
        sd.update(ckpt_lib.load_torch_state_dict(f))
    return sd


def load_llm(path: str) -> Dict[str, Any]:
    sd = _load_sharded_hf(path)
    llm_sd = {k: v for k, v in sd.items() if not k.startswith(("model.vae_", "vae_"))}
    params = {"llama": llama_lib.convert_from_hf(llm_sd)}
    # projector/predictor heads (reference any2pix_arch.py:30-46) are
    # stored under the meta-model: model.vae_projector_image.0.weight ...
    for name in (
        "vae_projector_image",
        "vae_projector_audio",
        "vae_predictor_image",
        "vae_predictor_audio",
    ):
        pref = f"model.{name}"
        if f"{pref}.0.weight" in sd:
            params[name] = {
                "fc1": {
                    "w": ckpt_lib.linear_w(sd[f"{pref}.0.weight"]),
                    "b": sd[f"{pref}.0.bias"],
                },
                "fc2": {
                    "w": ckpt_lib.linear_w(sd[f"{pref}.2.weight"]),
                    "b": sd[f"{pref}.2.bias"],
                },
            }
    return params


def load_prior(path: str) -> Dict[str, Any]:
    """ckpts/prior/model.bin → prior param tree (reference
    pipeline.py:117-120)."""
    sd = ckpt_lib.load_torch_state_dict(path)
    gpt2_sd = {
        k[len("model.") :]: v for k, v in sd.items() if k.startswith("model.")
    }
    params: Dict[str, Any] = {
        "gpt2": gpt2_lib.convert_from_hf(gpt2_sd),
        "sos": {"w": sd["start_of_sequence_tokens.weight"]},
        "eos": {"w": sd["end_of_sequence_tokens.weight"]},
        "modality_embedding": {"w": sd["modality_embedding.weight"]},
    }
    # per-key input projections: input_sequence_embed_linear.<i>.weight
    key_order = ["src_type", "imagebind", "crossattn_clip", "score", "noisy_inputs"]
    for i, name in enumerate(key_order):
        wk = f"input_sequence_embed_linear.{i}.weight"
        if wk in sd:
            params[f"proj_{name}"] = {
                "w": ckpt_lib.linear_w(sd[wk]),
                "b": sd[f"input_sequence_embed_linear.{i}.bias"],
            }
    if "output_proj.weight" in sd:
        params["output_proj"] = {
            "w": ckpt_lib.linear_w(sd["output_proj.weight"]),
            "b": sd.get("output_proj.bias"),
        }
    return params


def load_ip_adapter(path: str, unet_attn_paths) -> Dict[str, Any]:
    sd = ckpt_lib.load_torch_state_dict(path)
    image_proj_sd = {
        k[len("image_proj.") :]: v for k, v in sd.items() if k.startswith("image_proj.")
    }
    ip_sd = {
        k[len("ip_adapter.") :]: v for k, v in sd.items() if k.startswith("ip_adapter.")
    }
    return {
        "image_proj": ipa.convert_image_proj_from_torch(image_proj_sd),
        "ip_attn": ipa.convert_ip_attn_from_torch(ip_sd, unet_attn_paths),
    }


def is_converted_root(ckpt: str) -> bool:
    """True when `ckpt` is an orbax root written by
    scripts/convert_checkpoints.py (per-component orbax dirs) rather
    than the reference's torch layout (reference pipeline.py:96-147)."""
    return os.path.isdir(os.path.join(ckpt, "llm")) and os.path.exists(
        os.path.join(ckpt, "llm", "_CHECKPOINT_METADATA")
    )


def load_pipeline_params_orbax(cfg, root: str) -> Dict[str, Any]:
    """Restore the pipeline param dict from a converted orbax root.

    This is the warm-boot path: `convert_checkpoints.py --quant-llm
    int4` bakes the packed int4 weights + scales into the stored LLM,
    so boot is a plain array restore — no torch pickle parsing and no
    on-device re-quantization (the reference re-quantizes to NF4 at
    every load, reference pipeline.py:30; r3 measured that at 64.6 s
    per boot on this chip)."""
    from .models import unet_convert

    names = (
        "llm", "prior", "unet", "vae", "text1", "text2", "refiner",
        "prior_text", "imagebind_vision", "imagebind_audio",
    )
    # a partially converted root (convert_checkpoints.py --only llm)
    # passes is_converted_root but would crash orbax with an opaque
    # error on the first absent dir — fail with the actual gap instead
    missing = [
        n for n in names + ("ip_adapter",)
        if not os.path.isdir(os.path.join(root, n))
    ]
    if missing:
        raise FileNotFoundError(
            f"incomplete converted root {root!r}: missing {missing} — "
            "re-run scripts/convert_checkpoints.py without --only, or "
            "boot via loaders.staged_params_from_root (it skips absent "
            "groups)"
        )
    params: Dict[str, Any] = {}
    for name in names:
        params[name] = ckpt_lib.restore(os.path.join(root, name))
    ip = ckpt_lib.restore(os.path.join(root, "ip_adapter"))
    params["image_proj"] = ip["image_proj"]
    params["unet"] = unet_convert.merge_ip_weights(params["unet"], ip["ip_attn"])
    params["inpaint_unet"] = params["unet"]  # shares base components
    return params


def staged_params_from_root(
    cfg, root: str, budget_bytes: float = 12.5e9, pin: tuple = ()
):
    """Single-chip warm boot over a converted orbax root: a
    `StagedParams` store whose factories restore each component group
    on FIRST ACCESS — the full-size stack (~18 GB with the 7B LLM,
    ImageBind and the SDXL pile) cannot co-reside on a 16 GB chip, so
    the eager `load_pipeline_params_orbax` would OOM. Groups evict LRU
    under `budget_bytes` and re-stage from the host cache (the on-disk
    artifact is read once per group per process). Multi-chip
    deployments restore eagerly and shard instead."""
    from .core.staging import StagedParams
    from .models import unet_convert

    def plain(name):
        return lambda: ckpt_lib.restore(os.path.join(root, name))

    def unet_with_ip():
        ip = ckpt_lib.restore(os.path.join(root, "ip_adapter"))
        unet = ckpt_lib.restore(os.path.join(root, "unet"))
        # roots whose UNet already carries to_k_ip/to_v_ip leaves store
        # image_proj alone
        return unet_convert.merge_ip_weights(unet, ip.get("ip_attn") or {})

    def image_proj():
        return ckpt_lib.restore(os.path.join(root, "ip_adapter"))["image_proj"]

    factories = {
        name: plain(name)
        for name in (
            "llm", "prior", "vae", "text1", "text2", "refiner",
            "prior_text", "imagebind_vision", "imagebind_audio",
        )
        if os.path.isdir(os.path.join(root, name))
    }
    factories["unet"] = unet_with_ip
    factories["image_proj"] = image_proj
    return StagedParams(
        factories, budget_bytes=budget_bytes,
        aliases={"inpaint_unet": "unet"}, pin=pin,
    )


def load_pipeline_params(cfg, ckpt: str, llm_folder: str) -> Dict[str, Any]:
    """Assemble the full pipeline param dict from a reference-layout
    checkpoint root. Components whose converters are not yet wired
    (SDXL UNet/VAE diffusers state dicts, ImageBind) raise with a
    pointer to the converter module."""
    from .models import unet_convert

    if is_converted_root(ckpt):
        return load_pipeline_params_orbax(cfg, ckpt)

    params: Dict[str, Any] = {}
    params["llm"] = load_llm(os.path.join(ckpt, llm_folder))
    params["prior"] = load_prior(os.path.join(ckpt, "prior", "model.bin"))

    sdxl_dir = os.path.join(ckpt, "sdxl-base")
    params["unet"] = unet_convert.load_unet(os.path.join(sdxl_dir, "unet"), cfg.unet)
    params["vae"] = unet_convert.load_vae(os.path.join(sdxl_dir, "vae"), cfg.vae)
    params["text1"] = clip_lib.convert_text_from_hf(
        _load_sharded_hf(os.path.join(sdxl_dir, "text_encoder"))
    )
    params["text2"] = clip_lib.convert_text_from_hf(
        _load_sharded_hf(os.path.join(sdxl_dir, "text_encoder_2"))
    )
    params["refiner"] = unet_convert.load_unet(
        os.path.join(ckpt, "sdxl-refiner", "unet"), cfg.refiner
    )
    params["inpaint_unet"] = params["unet"]  # shares base components
    params["prior_text"] = clip_lib.convert_text_from_hf(
        _load_sharded_hf(os.path.join(ckpt, "clip-vit-h"))
    )
    ip = load_ip_adapter(
        os.path.join(ckpt, "sdxl", "ip_adapter_global_local_2_view.bin"),
        unet_convert.cross_attn_paths(cfg.unet),
    )
    params["image_proj"] = ip["image_proj"]
    params["unet"] = unet_convert.merge_ip_weights(params["unet"], ip["ip_attn"])

    from .models import imagebind as ib

    ib_sd = ckpt_lib.load_torch_state_dict(os.path.join(ckpt, "imagebind_huge.pth"))
    params["imagebind_vision"] = ib.convert_from_imagebind(ib_sd, "vision")
    params["imagebind_audio"] = ib.convert_from_imagebind(ib_sd, "audio")
    return params


def load_pretrained_model(
    model_path: str,
    model_base: str | None = None,
    load_lora: bool = False,
    projector_only: bool = False,
):
    """Rebuild of reference llm/model/builder.py:26-136
    `load_pretrained_model`: three load modes for the multimodal LM —
      * full finetune dir (default);
      * LoRA adapters over a base (merge on load);
      * projector-only delta over a base (tune_mm_mlp_adapter runs).
    Returns (params, tokenizer, token_ids).
    """
    from .llm.tokenizer import initialize_vision_tokenizer, load_tokenizer

    tokenizer = load_tokenizer(os.path.join(model_path, "tokenizer"))
    token_ids = initialize_vision_tokenizer(tokenizer)
    if projector_only:
        assert model_base, "projector-only load needs --model-base"
        params = load_llm(model_base)
        heads = load_llm(model_path)  # dir holding only projector weights
        for k in (
            "vae_projector_image",
            "vae_projector_audio",
            "vae_predictor_image",
            "vae_predictor_audio",
        ):
            if k in heads:
                params[k] = heads[k]
        return params, tokenizer, token_ids
    if load_lora:
        assert model_base, "LoRA load needs --model-base"
        from .core import checkpoint as _ckpt
        from .core import tree as _tree
        from .train import lora as _lora

        params = load_llm(model_base)
        adapters = _ckpt.restore(os.path.join(model_path, "adapters"))
        flat = _tree.flatten(params)
        flat.update(_tree.flatten(adapters))
        return _lora.merge_lora(_tree.unflatten(flat)), tokenizer, token_ids
    return load_llm(model_path), tokenizer, token_ids
