"""Test harness config: run on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's recommended strategy — sharding correctness is
validated on 8 virtual CPU devices; the real TPU chip is exercised by
bench.py, not unit tests.

Environment gotcha: the axon sitecustomize registers and PINS the TPU
backend at interpreter start, before pytest imports this file —
JAX_PLATFORMS=cpu in the env is ignored by then. We tear the backend
down (`xla_bridge._clear_backends`) and re-init as an 8-device CPU
platform.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402


def _force_cpu_devices(n: int = 8) -> None:
    try:
        if jax.default_backend() == "cpu" and len(jax.devices()) >= n:
            return
    except Exception:
        pass
    from jax._src import xla_bridge as xb

    xb._clear_backends()
    # get_backend is memoized separately from the backend registry — a
    # stale cache entry would keep returning the pinned TPU client
    xb.get_backend.cache_clear()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) >= n


_force_cpu_devices(8)
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.key(0)


@pytest.fixture
def mesh8():
    from instructany2pix_tpu.core.mesh import make_mesh

    return make_mesh(n_data=4, n_model=2)
