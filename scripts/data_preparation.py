"""Offline ImageBind feature extraction → .npz feature files.

Equivalent of reference scripts/data_preparation.py:6-25: walk media
files, embed with the ImageBind encoders, save `npz['state']` vectors
that the vq-npz codec / MediaMap consume at train/inference time.

Usage:
  python scripts/data_preparation.py --input <dir> --output <dir> \
      [--ckpt ckpts/imagebind_huge.pth] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instructany2pix_tpu.codecs import image_io  # noqa: E402
from instructany2pix_tpu.core.prng import KeyChain  # noqa: E402
from instructany2pix_tpu.models import imagebind  # noqa: E402

IMAGE_EXT = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}
AUDIO_EXT = {".wav", ".npy"}


def process_one_image(params, cfg, path: str) -> np.ndarray:
    return np.asarray(imagebind.embed_vision(params, cfg, image_io.load_image(path)))[0]


def process_one_audio(params, cfg, path: str) -> np.ndarray:
    from instructany2pix_tpu.pipeline import _load_wav

    return np.asarray(imagebind.embed_audio(params, cfg, _load_wav(path)))[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--ckpt", default="ckpts/imagebind_huge.pth")
    ap.add_argument("--tiny", action="store_true", help="random tiny encoders (testing)")
    args = ap.parse_args()

    import jax

    kc = KeyChain(0)
    from instructany2pix_tpu.pipeline import _audio_patches

    if args.tiny or not os.path.exists(args.ckpt):
        vcfg = imagebind.ViTConfig.tiny()
        acfg = imagebind.ViTConfig.tiny(in_channels=1)
        vparams = imagebind.init(kc(), vcfg)
        aparams = imagebind.init(kc(), acfg, num_patches=_audio_patches(acfg))
        if not args.tiny:
            print(f"warning: {args.ckpt} not found — using random tiny encoders")
    else:
        vcfg = imagebind.ViTConfig.imagebind_vision()
        acfg = imagebind.ViTConfig.imagebind_audio()
        vparams = imagebind.convert_from_imagebind(args.ckpt, "vision")
        aparams = imagebind.convert_from_imagebind(args.ckpt, "audio")

    os.makedirs(args.output, exist_ok=True)
    for name in sorted(os.listdir(args.input)):
        stem, ext = os.path.splitext(name)
        src = os.path.join(args.input, name)
        dst = os.path.join(args.output, stem + ".npz")
        if ext.lower() in IMAGE_EXT:
            state = process_one_image(vparams, vcfg, src)
        elif ext.lower() in AUDIO_EXT:
            state = process_one_audio(aparams, acfg, src)
        else:
            continue
        np.savez(dst, state=state)
        print(f"{src} -> {dst} ({state.shape})")


if __name__ == "__main__":
    main()
