"""Grounding + subject consistency orchestration.

Rebuild of reference gdino/lib.py: phrase-grounded boxes
(GroundingDINO) → SAM masks → per-subject IP-Adapter *local-mode*
inpainting. The grounder and segmentor are pluggable callables so the
heavy models (Swin-T+deformable-attn DINO, SAM ViT-H — see
grounding/sam.py) can be swapped for the cosine-fallback grounder in
checkpoint-free environments.

Interfaces:
  grounder(image, caption, box_threshold, text_threshold)
      -> (boxes (N,4) cxcywh in [0,1], logits (N,), phrases [N str])
  segmentor(image, box_xyxy) -> mask (H, W) float in [0,1]
"""

from __future__ import annotations


from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .morphology import refine_mask

BOX_THRESHOLD = 0.35  # reference gdino/lib.py:74-75
TEXT_THRESHOLD = 0.25


def boxes_cxcywh_to_xyxy(boxes: np.ndarray, h: int, w: int) -> np.ndarray:
    cx, cy, bw, bh = boxes.T
    return np.stack(
        [(cx - bw / 2) * w, (cy - bh / 2) * h, (cx + bw / 2) * w, (cy + bh / 2) * h],
        axis=1,
    )


def match_phrase_to_box(
    phrases: Sequence[str], target: str
) -> Optional[int]:
    """Phrase→box match (reference gdino/lib.py:24-30): exact match
    first, then substring."""
    target = target.strip().lower()
    for i, p in enumerate(phrases):
        if p.strip().lower() == target:
            return i
    for i, p in enumerate(phrases):
        if target in p.strip().lower() or p.strip().lower() in target:
            return i
    return None


def get_mask(
    phrase: str,
    boxes: np.ndarray,  # (N, 4) cxcywh normalized
    phrases: Sequence[str],
    segmentor: Callable,
    image: np.ndarray,  # (H, W, 3)
    dilate_size: int = 40,
    erode_size: int = 10,
    blur_size: int = 21,
) -> Optional[np.ndarray]:
    """phrase → box → SAM mask → erode/dilate/blur (reference
    gdino/lib.py:21-51). Returns (H, W) float mask or None."""
    idx = match_phrase_to_box(phrases, phrase)
    if idx is None or len(boxes) == 0:
        return None
    h, w = image.shape[:2]
    box = boxes_cxcywh_to_xyxy(boxes[idx : idx + 1], h, w)[0]
    mask = segmentor(image, box)
    mask = refine_mask(jnp.asarray(mask), dilate_size, erode_size, blur_size)
    return np.asarray(mask)


def subject_consistency(
    subject_data: List[dict],  # [{"name": str, "embed": (D,) array}, ...]
    caption: str,
    image: np.ndarray,  # (H, W, 3) uint8 current edit
    segmentor: Callable,
    grounder: Callable,
    inpaint_fn: Callable,  # (image, mask, subject_embed, prompt) -> image
    strength: float = 0.7,
) -> Tuple[np.ndarray, dict]:
    """Per-subject localized re-synthesis (reference gdino/lib.py:69-103):
    ground all subject phrases jointly, then inpaint each subject's
    region conditioned on its embedding (IP-Adapter local mode,
    50 steps, scale 0.8 in the reference)."""
    names = [s["name"] for s in subject_data]
    text = " . ".join(names)
    boxes, logits, phrases = grounder(
        image, text, box_threshold=BOX_THRESHOLD, text_threshold=TEXT_THRESHOLD
    )
    annotations = {"boxes": boxes, "logits": logits, "phrases": phrases}
    out = image
    for subject in subject_data:
        mask = get_mask(subject["name"], boxes, phrases, segmentor, out)
        if mask is None:
            continue
        out = inpaint_fn(out, mask, subject["embed"], caption)
    return out, annotations


def cosine_fallback_grounder(embed_fn: Callable):
    """Checkpoint-free grounder: one whole-image box per phrase —
    keeps the subject-consistency path runnable without DINO weights
    (quality degrades to whole-image inpainting)."""

    def grounder(image, caption, box_threshold=0.35, text_threshold=0.25):
        phrases = [p.strip() for p in caption.split(".") if p.strip()]
        n = len(phrases)
        boxes = np.tile(np.asarray([[0.5, 0.5, 1.0, 1.0]], np.float32), (n, 1))
        return boxes, np.ones((n,), np.float32), phrases

    return grounder


def _load_bert_tokenizer(ckpt_dir: str):
    """Real-checkpoint caption tokenizer (reference gdino/lib.py:74-81
    uses HF bert-base-uncased). Loads `vocab.txt` placed next to
    gdino.pth; a real gdino.pth with no vocab is an error — the hash
    fallback tokenizer produces ids that are meaningless to the trained
    BERT text encoder, silently breaking grounding."""
    import os

    vocab_path = os.path.join(ckpt_dir, "vocab.txt")
    if os.path.exists(vocab_path):
        from .bert_tokenizer import BertWordpieceTokenizer

        return BertWordpieceTokenizer(vocab_path)
    raise FileNotFoundError(
        f"GroundingDINO checkpoint found but no BERT vocab at {vocab_path}; "
        "copy bert-base-uncased's vocab.txt next to gdino.pth (grounding "
        "captions must be wordpiece-encoded for the trained text encoder)."
    )


def build_segmentator(ckpt_dir: str = "ckpts/gdino", sam_cfg=None, dino_cfg=None):
    """Load SAM + GroundingDINO (reference gdino/lib.py:54-67
    `build_segmentator`): returns (segmentor, grounder). Falls back to
    the checkpoint-free box/cosine implementations when weights are
    absent (this environment ships none). `sam_cfg`/`dino_cfg` default
    to the full-size ViT-H / SwinT graphs; the checkpoint-boot test
    passes tiny-dims configs matching its synthetic checkpoints."""
    import os

    sam_path = os.path.join(ckpt_dir, "sam_vit_h_4b8939.pth")
    dino_path = os.path.join(ckpt_dir, "gdino.pth")
    if os.path.exists(sam_path) and os.path.exists(dino_path):
        from . import gdino as gdino_lib
        from . import sam as sam_lib

        sam_cfg = sam_cfg or sam_lib.SAMConfig.vit_h()
        segmentor = sam_lib.make_segmentor(
            sam_lib.convert_from_sam(sam_path, sam_cfg), sam_cfg
        )
        try:
            dino_cfg = dino_cfg or gdino_lib.GDinoConfig.swint()
            grounder = gdino_lib.make_grounder(
                gdino_lib.convert_from_torch(dino_path, dino_cfg), dino_cfg,
                tokenizer=_load_bert_tokenizer(ckpt_dir),
            )
        except NotImplementedError:
            grounder = cosine_fallback_grounder(None)
        return segmentor, grounder
    return box_fill_segmentor, cosine_fallback_grounder(None)


def box_fill_segmentor(image: np.ndarray, box_xyxy: np.ndarray) -> np.ndarray:
    """Checkpoint-free segmentor: fill the box (SAM stand-in)."""
    h, w = image.shape[:2]
    x0, y0, x1, y1 = [int(round(v)) for v in box_xyxy]
    mask = np.zeros((h, w), np.float32)
    mask[max(y0, 0) : min(y1, h), max(x0, 0) : min(x1, w)] = 1.0
    return mask
