"""Flash-attention fwd vs XLA at SDXL/LLM shapes (two-point timing).

Run alone on the real chip from the repo root:
    python benchmarks/flash_bench.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from benchmarks.timing import bench_loop
from instructany2pix_tpu.ops.flash_attention import (
    _reference_attention,
    flash_attention,
)

# (B, H, S, D): SDXL 1024² levels (batch 2 CFG and batch 1 inversion),
# 512² level-1, LLM train shape
SHAPES = [
    (2, 10, 4096, 64),
    (2, 20, 1024, 64),
    (2, 10, 1024, 64),
    (1, 10, 4096, 64),
    (4, 32, 2048, 128),
]


def main():
    rs = np.random.RandomState(0)
    for b, h, s, d in SHAPES:
        q = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
        k = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
        v = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
        for causal in (False, True):
            fl = lambda q, k, v: flash_attention(q, k, v, causal=causal)
            xl = lambda q, k, v: _reference_attention(q, k, v, causal, d**-0.5)
            err = float(
                jnp.max(
                    jnp.abs(
                        fl(q, k, v).astype(jnp.float32)
                        - xl(q, k, v).astype(jnp.float32)
                    )
                )
            )
            tf = bench_loop(fl, (q, k, v), iters=50)
            tx = bench_loop(xl, (q, k, v), iters=50)
            flops = 4 * b * h * s * s * d * (0.5 if causal else 1.0)
            print(
                f"({b},{h},{s},{d}) causal={int(causal)}: "
                f"flash {tf*1e6:8.1f}us ({flops/tf*1e-12:5.1f} TF/s, err {err:.1e})"
                f"  xla {tx*1e6:8.1f}us ({flops/tx*1e-12:5.1f} TF/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
