"""mtime-keyed LRU cache for decoded/preprocessed media files.

Serving residue attribution (VERDICT r4 item 5): each request pays a
PNG decode + numpy bilinear resize per media file and again for the
base image — pure host CPU that serializes in front of the device
stages. Edit workloads re-reference the same files constantly (the
same base image across a session's edits; the steady-batch bench uses
one fixture for all requests), so a small cache removes the residue
entirely on repeats while mtime keying keeps overwritten files fresh.

The reference has no counterpart (it re-loads and re-transforms per
call, reference pipeline.py:159-164, 289-293)."""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Any, Callable, Hashable


class FileCache:
    """LRU over (abspath, mtime_ns, size, tag) → computed value."""

    def __init__(self, max_items: int = 32):
        self.max_items = max_items
        self._d: OrderedDict = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, path: str, tag: Hashable, compute: Callable[[], Any]) -> Any:
        try:
            st = os.stat(path)
            key = (os.path.abspath(path), st.st_mtime_ns, st.st_size, tag)
        except OSError:
            return compute()  # non-file sources (arrays) aren't cached
        with self._lock:
            if key in self._d:
                self._d.move_to_end(key)
                self.hits += 1
                return self._d[key]
        val = compute()
        with self._lock:
            self._d[key] = val
            self._d.move_to_end(key)
            self.misses += 1
            while len(self._d) > self.max_items:
                self._d.popitem(last=False)
        return val

    def clear(self) -> None:
        with self._lock:
            self._d.clear()


# process-wide cache shared by the pipeline and the batched server;
# IA2P_MEDIA_CACHE=0 disables (every get() recomputes)
MEDIA_CACHE = FileCache(max_items=int(os.environ.get("IA2P_MEDIA_CACHE_N", "32")))


def cached(path: str, tag: Hashable, compute: Callable[[], Any]) -> Any:
    if os.environ.get("IA2P_MEDIA_CACHE", "1") == "0":
        return compute()
    return MEDIA_CACHE.get(path, tag, compute)
