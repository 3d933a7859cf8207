"""Tracing / profiling utilities.

The reference has no profiling beyond tqdm bars (SURVEY.md §5.1). Here:
  * `stage(name)` — context manager that records wall-clock per pipeline
    stage AND opens a `jax.profiler.TraceAnnotation` so stages show up
    in TPU profiler traces.
  * `StageTimes` — collected timings, attached to pipeline debug output.
  * `nan_check(tree, name)` — opt-in NaN guard (mirrors the ad-hoc
    guard at reference any2pix_llama.py:424-425); enable globally with
    `jax.config.update("jax_debug_nans", True)` for tracing-level
    checks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class StageTimes:
    def __init__(self):
        self.times: Dict[str, float] = {}

    def __repr__(self):
        inner = ", ".join(f"{k}={v * 1e3:.1f}ms" for k, v in self.times.items())
        return f"StageTimes({inner})"


_ACTIVE: list = []


@contextlib.contextmanager
def collect_stages():
    st = StageTimes()
    _ACTIVE.append(st)
    try:
        yield st
    finally:
        _ACTIVE.pop()


@contextlib.contextmanager
def stage(name: str):
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    for st in _ACTIVE:
        st.times[name] = st.times.get(name, 0.0) + dt


def nan_check(tree, name: str = "") -> None:
    import jax.numpy as jnp

    for i, leaf in enumerate(jax.tree.leaves(tree)):
        if jnp.issubdtype(leaf.dtype, jnp.floating) and not bool(
            jnp.all(jnp.isfinite(leaf))
        ):
            raise FloatingPointError(f"non-finite values in {name} leaf {i}")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a full profiler trace (xplane) viewable in TensorBoard/
    xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
