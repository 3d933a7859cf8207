"""Embedding-codec layer: the `VQVAE` wrapper + YAML-config builder.

Rebuild of reference llm/model/vae/builder.py:12-79. The production
config is `vq-npz` (reference vae/vq-npz.yaml): a **passthrough** codec
— the LLM consumes precomputed 1024-d ImageBind/CLIP embeddings loaded
from .npz files; the conv VQ-GAN stacks are training-era machinery the
shipped checkpoints never exercise (SURVEY.md §2.6). Codec contract:

  encode_seq(x) -> (quant, indices, info)   # info None → continuous
  decode_seq(indices, target_shape) -> reconstruction

Configs are YAML files resolved from this package dir by name, keeping
the reference's config-name surface (`vq-npz`) intact.
"""

from __future__ import annotations


import pathlib
from typing import Any, Optional

import numpy as np

from ..core.config import instantiate_from_config

CURR_PATH = pathlib.Path(__file__).parent.resolve()


class TensorLoader:
    """Identity codec over precomputed embeddings (reference
    vae/clip.py:31-43)."""

    def __init__(self, embed_dim, n_embed, *args, **kwargs):
        self.embed_dim = embed_dim
        self.n_embed = n_embed

    def encode_seq(self, x, model=None):
        return x, None, None

    def decode_seq(self, ind, target_shape=None):
        return ind


class NpzLoader:
    """Loads `npz['state']` feature files produced by the offline
    ImageBind extraction (reference vae/clip.py:45-52,
    scripts/data_preparation.py)."""

    def __call__(self, path):
        return np.load(path)["state"]


class ClipVisionCodec:
    """CLIP image embedding as codec (reference vae/clip.py:7-21) —
    backed by our JAX CLIP vision encoder instead of a torch model."""

    def __init__(self, embed_dim=1024, n_embed=1024, params=None, cfg=None):
        from ..models import clip as clip_lib

        self.embed_dim = embed_dim
        self.n_embed = n_embed
        self._params = params
        self._cfg = cfg or clip_lib.CLIPVisionConfig.vit_h()

    def encode_seq(self, pixels, model=None):
        from ..models import clip as clip_lib

        assert self._params is not None, "ClipVisionCodec needs loaded weights"
        out = clip_lib.vision_apply(self._params, pixels, self._cfg)
        x = out["image_embeds"][..., None, None]
        return x, None, None

    def decode_seq(self, ind, target_shape=None):
        return ind


# target-string aliases so reference-style YAML configs resolve here
_TARGET_ALIASES = {
    "instructany2pix.llm.model.vae.clip.TensorLoader": TensorLoader,
    "instructany2pix.llm.model.vae.clip.ClipVisionModelInterfaceForLLM": ClipVisionCodec,
}


def _instantiate(model_config):
    target = model_config.get("target", "")
    if target in _TARGET_ALIASES:
        return _TARGET_ALIASES[target](**model_config.get("params", {}))
    return instantiate_from_config(model_config)


def build_vae(config_name: str, modality: str):
    """Load `<config_name>.yaml` from the package dir and build
    (codec, processor) — reference builder.py:12-32."""
    import yaml

    with open(CURR_PATH / f"{config_name}.yaml") as f:
        config = yaml.safe_load(f.read())
    model = _instantiate(config["model"])
    processor: Any
    if config.get("processor") == "npz":
        processor = NpzLoader()
    elif modality == "image":
        from .processors import ImageVAEProcessor

        processor = ImageVAEProcessor(config.get("image_size", 256))
    else:
        from .processors import AudioVAEProcessor

        processor = AudioVAEProcessor(
            config.get("data", {}).get("params", {}).get("sample_rate", 22050)
        )
    return model, processor


class VQVAEProcessor:
    def __init__(self, image_proc, audio_proc):
        self.image_vae_processor = image_proc
        self.audio_vae_processor = audio_proc

    def __call__(self, x, modality):
        if modality == "image":
            return self.image_vae_processor(x)
        if modality == "audio":
            return self.audio_vae_processor(x)
        raise NotImplementedError(modality)


class VQVAE:
    """Frozen multimodal codec pair (reference builder.py:49-78)."""

    def __init__(self, image_vae: Optional[str], audio_vae: Optional[str]):
        self.image_vae = None
        self.audio_vae = None
        self.image_vae_processor = None
        self.audio_vae_processor = None
        self.embed_dim_image = 1
        self.embed_dim_audio = 1
        self.vocab_size_image = 1
        self.vocab_size_audio = 1
        if image_vae:
            self.image_vae, self.image_vae_processor = build_vae(image_vae, "image")
            self.embed_dim_image = self.image_vae.embed_dim
            self.vocab_size_image = self.image_vae.n_embed
        if audio_vae:
            self.audio_vae, self.audio_vae_processor = build_vae(audio_vae, "audio")
            self.embed_dim_audio = self.audio_vae.embed_dim
            self.vocab_size_audio = self.audio_vae.n_embed
        self.processor = VQVAEProcessor(
            self.image_vae_processor, self.audio_vae_processor
        )

    def __call__(self, x: dict) -> dict:
        out = {}
        if "image" in x and self.image_vae is not None:
            out["image"] = self.image_vae.encode_seq(x["image"])
        if "audio" in x and self.audio_vae is not None:
            out["audio"] = self.audio_vae.encode_seq(x["audio"])
        return out
