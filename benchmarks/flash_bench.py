import sys; sys.path.insert(0, "/root/repo")
"""Dev bench: flash-attention fwd at SDXL/LLM shapes after the
bf16-operand fix (QK^T and PV dots in input dtype, f32 accumulate).

Run alone on the real chip: python dev_flash_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.ops.flash_attention import (
    _reference_attention,
    flash_attention,
)

# (B, H, S, D): SDXL 1024² 64²-level self-attn, 32²-level, LLM prefill
SHAPES = [
    (2, 10, 4096, 64),
    (2, 20, 1024, 64),
    (2, 10, 16384, 64),
    (4, 32, 2048, 128),  # llama train shape (causal too)
]


def bench(fn, args, iters=30):
    @jax.jit
    def loop(q, k, v):
        def body(i, carry):
            o = fn(carry, k, v)
            return carry + (1e-7 * jnp.mean(o)).astype(carry.dtype)

        return jax.lax.fori_loop(0, iters, body, q)

    r = loop(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    r = loop(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e6


def main():
    print("device:", jax.devices()[0].device_kind)
    rs = np.random.RandomState(0)
    for b, h, s, d in SHAPES:
        q = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
        k = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
        v = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
        for causal in ([False] if s > 8192 else [False, True]):
            fl = lambda q, k, v: flash_attention(q, k, v, causal=causal)
            xl = lambda q, k, v: _reference_attention(q, k, v, causal, d**-0.5)
            # correctness vs XLA reference
            err = float(
                jnp.max(
                    jnp.abs(
                        fl(q, k, v).astype(jnp.float32)
                        - xl(q, k, v).astype(jnp.float32)
                    )
                )
            )
            tf = bench(fl, (q, k, v))
            flops = 4 * b * h * s * s * d * (0.5 if causal else 1.0)
            line = (
                f"({b},{h},{s},{d}) causal={int(causal)}: "
                f"flash {tf:8.1f}us ({flops/tf*1e-6:6.1f} TF/s, err {err:.1e})"
            )
            if s <= 4096:
                tx = bench(xl, (q, k, v))
                line += f"  xla {tx:8.1f}us ({flops/tx*1e-6:6.1f} TF/s)"
            print(line, flush=True)


if __name__ == "__main__":
    main()
