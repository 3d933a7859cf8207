"""Test harness config: run on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's recommended strategy — sharding correctness is
validated on `--xla_force_host_platform_device_count=8` CPU devices;
the real TPU chip is exercised by bench.py, not unit tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.key(0)


@pytest.fixture
def mesh8():
    from instructany2pix_tpu.core.mesh import make_mesh

    return make_mesh(n_data=4, n_model=2)
