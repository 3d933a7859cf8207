"""Memory-budgeted staged parameter store for single-chip deployment.

One v5e chip (16 GB HBM) cannot hold the 7B LLM, ImageBind, and the
full SDXL stack simultaneously (BASELINE.md r2) — the reference squeezes
onto one GPU with fp16 + bitsandbytes NF4 (reference pipeline.py:30,101)
and still shares components across pipelines (pipeline.py:106-139).
`StagedParams` is the TPU-native counterpart: a mapping the pipeline
uses as its `params` dict whose component groups materialize on first
access and are LRU-evicted when the device-byte budget would overflow.

Evicted groups are cached on the host (numpy) the first time they are
evicted, so later swaps are a `device_put`, not a reload/requantize —
the offline-quantized LLM artifact (scripts/convert_checkpoints.py
--quant-llm) loads once per process, ever. Swap and load seconds are
recorded in `stats` so end-to-end wall-clock numbers can attribute
staging cost line-by-line (VERDICT r3 item 1).

Multi-chip deployments (v5e-8) hold everything resident and sharded and
never need this store.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, Dict, Iterator, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


def tree_device_bytes(tree: Any) -> int:
    return sum(leaf.nbytes for leaf in jax.tree.leaves(tree))


def _device_barrier() -> None:
    """Wait until all previously dispatched device work has finished.

    `block_until_ready` can return before remote execution completes
    over the axon tunnel; a host readback of a freshly dispatched
    computation is the reliable barrier (device programs execute in
    dispatch order, so reading this one back flushes everything before
    it)."""
    probe = jnp.full((8,), 1.0, jnp.float32) * 2.0
    np.asarray(probe)


class StagedParams(Mapping):
    """Dict-shaped view over lazily materialized param groups.

    factories: name -> zero-arg callable returning the group's device
        param tree (checkpoint restore, random init, quantize, ...).
    budget_bytes: device-byte ceiling across live groups. A single
        group larger than the budget still materializes (after evicting
        everything else).
    aliases: name -> other name sharing the same tree (the inpainting
        UNet shares the base UNet, reference pipeline.py:132-139).
    pin: group names never evicted (cheap, always-hot components).
    """

    def __init__(
        self,
        factories: Dict[str, Callable[[], Any]],
        budget_bytes: float = 14e9,
        aliases: Optional[Dict[str, str]] = None,
        pin: tuple = (),
        host_cache: bool = True,
        host_trees: Optional[Dict[str, Any]] = None,
    ):
        """`host_trees` pre-primes the host cache: groups whose numpy
        trees the caller already holds evict without a device→host pull
        and re-materialize as a plain device_put. `factories` still
        control the FIRST materialization (and may consume the same
        host trees)."""
        self._factories = dict(factories)
        self._aliases = dict(aliases or {})
        self._budget = int(budget_bytes)
        self._pin = set(pin)
        self._host_cache = host_cache
        self._live: Dict[str, Any] = {}
        # materialize/evict mutate _live/_order and free device buffers;
        # a PipelineServer scheduler thread and a main-thread pipe() on
        # the same store must serialize or one could delete buffers the
        # other just handed out (ADVICE r4)
        self._lock = threading.RLock()
        self._host: Dict[str, Any] = dict(host_trees or {})
        self._bytes: Dict[str, int] = {}
        self._order: list = []  # LRU order, most-recently-used last
        self.stats: Dict[str, Any] = {
            "load_s": {},  # first materialization (factory) per group
            "swap_s": 0.0,  # cumulative host->device re-materialization
            "swaps": 0,
            "swap_bytes": 0,  # cumulative re-staged bytes (deployment
            # projection: swap_bytes / PCIe-class bandwidth = staging
            # cost off this dev tunnel)
            "evict_s": 0.0,  # cumulative eviction (incl. device->host pulls)
            "evictions": [],  # group names in eviction order
        }

    # ------------------------------------------------------------ mapping

    def _resolve(self, name: str) -> str:
        seen = set()
        while name in self._aliases:
            if name in seen:
                raise ValueError(f"alias cycle at {name!r}")
            seen.add(name)
            name = self._aliases[name]
        return name

    def __getitem__(self, name: str) -> Any:
        with self._lock:
            name = self._resolve(name)
            if name in self._live:
                self._touch(name)
                return self._live[name]
            return self._materialize(name)

    def __setitem__(self, name: str, tree: Any) -> None:
        """Replace a group in place (e.g. the server sharding the LLM).
        The new tree is treated as live and budget-accounted."""
        with self._lock:
            name = self._resolve(name)
            if name in self._live:
                self._order.remove(name)
            self._live[name] = tree
            self._bytes[name] = tree_device_bytes(tree)
            self._host.pop(name, None)  # stale host copy
            self._order.append(name)
            self._shrink(exclude=name)

    def __iter__(self) -> Iterator[str]:
        return iter(set(self._factories) | set(self._aliases) | set(self._live))

    def __len__(self) -> int:
        return len(set(self._factories) | set(self._aliases) | set(self._live))

    def __contains__(self, name: object) -> bool:
        name = self._resolve(str(name))
        return name in self._factories or name in self._live

    # ------------------------------------------------------------ engine

    def _touch(self, name: str) -> None:
        self._order.remove(name)
        self._order.append(name)

    def _live_bytes(self) -> int:
        return sum(self._bytes[n] for n in self._live)

    def _materialize(self, name: str) -> Any:
        if name not in self._factories:
            raise KeyError(name)
        # evict BEFORE materializing when the incoming size is known
        # (host-cached groups) — staging first and shrinking after puts
        # the PEAK at live+incoming, which OOMs a full chip even though
        # the steady state fits (r4 wall-clock bench, 14 GB live + 4.5 GB
        # refiner on a 16 GB v5e)
        if name in self._host:
            incoming = tree_device_bytes(self._host[name])
            while self._live_bytes() + incoming > self._budget:
                victim = next(
                    (n for n in self._order if n not in self._pin), None
                )
                if victim is None:
                    break
                self._evict(victim)
        t0 = time.perf_counter()
        if name in self._host:
            tree = jax.tree.map(jnp.asarray, self._host[name])
            # device_put is ASYNC — without a barrier the transfer tail
            # lands inside whichever compute stage syncs next, inflating
            # it (r4 wall-clock: a 167 s "inversion" that was mostly the
            # UNet group still in flight). Block here so swap_s is the
            # true host→device residency cost.
            jax.block_until_ready(tree)
            _device_barrier()
            self.stats["swap_s"] += time.perf_counter() - t0
            self.stats["swaps"] += 1
            self.stats["swap_bytes"] += tree_device_bytes(tree)
        else:
            tree = self._factories[name]()
            self.stats["load_s"][name] = time.perf_counter() - t0
        self._live[name] = tree
        self._bytes[name] = tree_device_bytes(tree)
        self._order.append(name)
        self._shrink(exclude=name)
        return tree

    def _shrink(self, exclude: str) -> None:
        while self._live_bytes() > self._budget:
            victim = next(
                (n for n in self._order if n != exclude and n not in self._pin),
                None,
            )
            if victim is None:
                break  # everything left is pinned or the group itself
            self._evict(victim)

    def _evict(self, name: str) -> None:
        t0 = time.perf_counter()
        tree = self._live.pop(name)
        self._order.remove(name)
        self._bytes.pop(name)
        # all dispatched work that may read these buffers must land
        # before the buffers are freed
        _device_barrier()
        if self._host_cache and name not in self._host:
            self._host[name] = jax.tree.map(np.asarray, tree)
        for leaf in jax.tree.leaves(tree):
            try:
                leaf.delete()
            except Exception:
                pass
        self.stats["evict_s"] += time.perf_counter() - t0
        self.stats["evictions"].append(name)

    # ------------------------------------------------------------ control

    def prefetch(self, *names: str) -> None:
        for n in names:
            self[n]

    def evict(self, *names: str) -> None:
        with self._lock:
            for n in names:
                n = self._resolve(n)
                if n in self._live:
                    self._evict(n)

    def pin(self, *names: str) -> None:
        """Mark groups never-evicted from now on (eviction planning:
        hold the diffusion-stage set hot through the edit's middle)."""
        with self._lock:
            self._pin.update(self._resolve(n) for n in names)

    def unpin(self, *names: str) -> None:
        with self._lock:
            for n in names:
                self._pin.discard(self._resolve(n))

    def live_groups(self) -> Dict[str, int]:
        with self._lock:
            return {n: self._bytes[n] for n in self._order}
