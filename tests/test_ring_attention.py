"""Ring attention vs single-device reference on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instructany2pix_tpu.core.mesh import make_mesh
from instructany2pix_tpu.ops.flash_attention import _reference_attention
from instructany2pix_tpu.parallel.ring_attention import ring_attention


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_reference(causal):
    mesh = make_mesh(n_data=8, n_model=1)
    b, s, h, d = 2, 64, 4, 16  # s divisible by 8
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (b, s, h, d))
    k = jax.random.normal(kk, (b, s, h, d))
    v = jax.random.normal(kv, (b, s, h, d))
    out = ring_attention(q, k, v, mesh, axis="data", causal=causal)
    ref = _reference_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        causal, d**-0.5,
    )
    ref = jnp.swapaxes(ref, 1, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ring_output_stays_sequence_sharded():
    mesh = make_mesh(n_data=8, n_model=1)
    q = jax.random.normal(jax.random.key(0), (1, 32, 2, 8))
    out = ring_attention(q, q, q, mesh, axis="data")
    assert "data" in str(out.sharding.spec)
