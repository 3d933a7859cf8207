"""Device mesh + sharding helpers.

The reference scales with DeepSpeed ZeRO-3 over NCCL (reference
scripts/zero3.json:16-27, scripts/train.sh:7-9). The TPU-native
equivalent is GSPMD: we build a `jax.sharding.Mesh` with named axes and
annotate parameter/activation shardings; XLA inserts the collectives
over ICI.

Axis conventions used across the framework:
  "data"  — batch / data-parallel axis (ZeRO-style param sharding also
            rides this axis via fully-sharded rules).
  "model" — tensor-parallel axis (attention heads / MLP hidden / UNet
            channels).
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a 2D (data, model) mesh over the available devices.

    If n_data is None, uses all devices / n_model along the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        assert n % n_model == 0, (n, n_model)
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    device = device or jax.devices()[0]
    return Mesh(np.array([device]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))


_CURRENT_MESH: list = []


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    _CURRENT_MESH.append(mesh)
    try:
        with jax.set_mesh(mesh):
            yield mesh
    finally:
        _CURRENT_MESH.pop()


def current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH[-1] if _CURRENT_MESH else None


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(tree, mesh: Mesh):
    """Device-put a pytree of arrays with leading batch dim sharded on data."""
    sh = batch_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
