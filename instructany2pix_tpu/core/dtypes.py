"""Dtype policy for TPU execution.

The reference runs the LLM in bitsandbytes NF4 with fp32 compute
(reference pipeline.py:30) and the diffusion stack in fp16
(reference pipeline.py:101). On TPU the native fast dtype is bfloat16:
MXU matmuls take bf16 inputs with fp32 accumulation, so the policy here
is bf16 params/compute with fp32 for numerically sensitive reductions
(norms, softmax, scheduler math).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Mixed-precision policy threaded through every model.

    param_dtype:   storage dtype of weights.
    compute_dtype: dtype activations/matmuls run in.
    norm_dtype:    dtype for normalization statistics / softmax accumulations.
    """

    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32

    def cast_params(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def c(self, x):
        """Cast an activation to the compute dtype."""
        return x.astype(self.compute_dtype)

    def n(self, x):
        """Cast an activation to the norm/accumulation dtype."""
        return x.astype(self.norm_dtype)


# Module-level defaults. Tests override with fp32 everywhere for exactness.
DEFAULT = DTypePolicy()
FP32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def policy_for(name: str) -> DTypePolicy:
    return {"default": DEFAULT, "bf16": DEFAULT, "fp32": FP32}[name]
