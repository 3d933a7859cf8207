"""Multimodal tokenization/stopping utilities.

Rebuild of reference llm/mm_utils.py: `tokenizer_image_token` splices
IMAGE_TOKEN_INDEX (-200) at `<image>` split points (mm_utils.py:44-63);
`KeywordsStoppingCriteria` stops generation when any keyword's token
suffix matches (mm_utils.py:77-107); `expand2square`/`process_images`
are the LLaVA-style image preprocessors (mm_utils.py:15-41).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .constants import IMAGE_TOKEN_INDEX


def tokenizer_image_token(
    prompt: str,
    tokenizer,
    image_token_index: int = IMAGE_TOKEN_INDEX,
) -> np.ndarray:
    """Tokenize, replacing each `<image>` with the sentinel index."""
    chunks = [
        tokenizer(c).input_ids if c else [] for c in prompt.split("<image>")
    ]
    ids: List[int] = []
    for i, chunk in enumerate(chunks):
        chunk = list(chunk)
        if i > 0:
            # strip the BOS the tokenizer re-adds mid-string
            if chunk and chunk[0] == getattr(tokenizer, "bos_token_id", 1):
                chunk = chunk[1:]
            ids.append(image_token_index)
        ids.extend(chunk)
    return np.asarray(ids, np.int64)


class KeywordsStoppingCriteria:
    """Host-side stopping check over generated ids: stop when the tail
    of the output matches any keyword's token ids (or its decoded text
    contains the keyword)."""

    def __init__(self, keywords: Sequence[str], tokenizer, input_len: int = 0):
        self.keywords = list(keywords)
        self.tokenizer = tokenizer
        self.input_len = input_len
        self.keyword_ids = []
        for kw in keywords:
            ids = tokenizer(kw, add_special_tokens=False)
            ids = ids.input_ids if hasattr(ids, "input_ids") else ids
            ids = list(ids)
            if ids and ids[0] == getattr(tokenizer, "bos_token_id", None):
                ids = ids[1:]
            self.keyword_ids.append(ids)

    def __call__(self, output_ids: Sequence[int]) -> bool:
        out = list(output_ids)[self.input_len :]
        for kw_ids in self.keyword_ids:
            if kw_ids and out[-len(kw_ids) :] == kw_ids:
                return True
        text = self.tokenizer.decode(out)
        return any(kw in text for kw in self.keywords)


def expand2square(img: np.ndarray, background_color=(122, 116, 104)) -> np.ndarray:
    """Pad to square with a background color (reference mm_utils.py:15-27)."""
    h, w = img.shape[:2]
    if h == w:
        return img
    size = max(h, w)
    out = np.empty((size, size, 3), img.dtype)
    out[...] = np.asarray(background_color, img.dtype)
    top = (size - h) // 2
    left = (size - w) // 2
    out[top : top + h, left : left + w] = img
    return out


def process_images(images: Sequence[np.ndarray], image_size: int = 224) -> np.ndarray:
    """Square-pad + resize batch preprocessor (reference
    mm_utils.py:29-41)."""
    from ..codecs.image_io import resize_center_crop

    out = [resize_center_crop(expand2square(np.asarray(im)), image_size) for im in images]
    return np.stack(out).astype(np.float32)
