"""Metrics logging — structured replacement for the reference's wandb
dependency (reference training/trainer.py:256-276, training/utils.py).

`MetricLogger` prints JSON-lines to stdout and appends to a file; if
wandb is importable and `use_wandb=True` it mirrors there. Image grids
(`dump_images`) replace the reference's matplotlib wandb grid with a
PNG tile written next to the log.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, path: Optional[str] = None, use_wandb: bool = False):
        self.path = path
        self._fh = open(path, "a") if path else None
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
            except ImportError:
                pass
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "t": round(time.time() - self._t0, 2), **metrics}
        line = json.dumps(rec)
        print(line, flush=True)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._wandb is not None and getattr(self._wandb, "run", None):
            self._wandb.log(metrics, step=step)

    def dump_images(self, step: int, images, out_dir: str = "train_images") -> str:
        """Tile (N, H, W, 3) uint8 frames into one grid PNG (the
        reference's wandb_dump_images)."""
        os.makedirs(out_dir, exist_ok=True)
        arr = np.asarray(images)
        n, h, w, c = arr.shape
        cols = int(np.ceil(np.sqrt(n)))
        rows = int(np.ceil(n / cols))
        grid = np.zeros((rows * h, cols * w, c), arr.dtype)
        for i in range(n):
            r, cc = divmod(i, cols)
            grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = arr[i]
        path = os.path.join(out_dir, f"step_{step}.png")
        from ..codecs.image_io import save_image

        save_image(path, grid)
        if self._wandb is not None and getattr(self._wandb, "run", None):
            self._wandb.log(
                {"image_gen": self._wandb.Image(grid)}, step=step
            )
        return path


def embedding_heatmap(vec, size: int = 128) -> np.ndarray:
    """Render a codec embedding vector as an (size, size, 3) uint8
    heatmap — the generation-preview fallback when no decoder pipeline
    is loaded (the reference trainer skips the image dump entirely when
    `self.pipe is None`, trainer.py:258; we always emit *something* so
    embedding drift is visible during training)."""
    v = np.asarray(vec, np.float32).reshape(-1)
    side = int(np.ceil(np.sqrt(v.size)))
    pad = np.zeros(side * side, np.float32)
    pad[: v.size] = v
    img = pad.reshape(side, side)
    lo, hi = img.min(), img.max()
    img = (img - lo) / (hi - lo + 1e-8)
    # nearest-neighbor upsample to a viewable size
    rep = max(1, size // side)
    img = np.repeat(np.repeat(img, rep, 0), rep, 1)
    u8 = (img * 255).astype(np.uint8)
    # simple blue→red diverging map: R = v, G = 0.2, B = 1-v
    return np.stack([u8, np.full_like(u8, 48), 255 - u8], axis=-1)
