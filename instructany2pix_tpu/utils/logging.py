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
        return path
