"""PRNG threading discipline.

JAX PRNG is explicit and splittable; this replaces the reference's
global `torch.manual_seed(seed)` (reference serve.py:40). A `KeyChain`
hands out fresh keys in a deterministic order so pipeline stages get
independent streams from a single user seed.
"""

from __future__ import annotations

import jax


class KeyChain:
    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs


def keys_for(seed: int, *names: str):
    """Named independent keys from one seed via fold_in — order-stable."""
    base = jax.random.key(seed)
    return tuple(jax.random.fold_in(base, hash(n) % (2**31)) for n in names)


def row_normal(key, shape, dtype=None):
    """Gaussian noise where `key` is either one key (whole tensor) or a
    (B,) batch of keys — then row i's noise depends ONLY on key[i], so
    a microbatched server keeps per-request determinism regardless of
    batch composition (serving.py)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if getattr(key, "ndim", 0) == 1:
        assert key.shape[0] == shape[0], (key.shape, shape)
        return jax.vmap(lambda kk: jax.random.normal(kk, shape[1:], dtype))(key)
    return jax.random.normal(key, shape, dtype)
