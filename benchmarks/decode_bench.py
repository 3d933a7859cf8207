"""Decode-latency levers A/B (VERDICT r3 item 5): is ≤5.5 ms/tok
int4-grouped reachable?

Measures, at the four 7B decode shapes (two-point loop timing, weights
as loop arguments — closure capture bakes them into the graph and
produces sub-floor nonsense):

1. grouped-kernel variant sweep — `chain` (current default: G
   sequential partial dots, suspected M=1 issue-latency tax),
   `batched` (ONE G-batched dot_general + scale-weighted reduce),
   `tile` (scale the dequantized tile, one full-K dot).
2. speculation breakeven — the same matvec at M = 1/2/4/8. Verifying k
   drafted tokens costs one M=k pass; self-speculation wins iff
   accepted_tokens × T(M=1) > T(M=k) + draft_cost. The M-scaling curve
   IS the measured verdict: if T(M=4) ≈ T(M=1) (bandwidth-bound), the
   verify pass is nearly free and the scheme's viability reduces to
   draft quality; if T(M=k) ≈ k·T(M=1), speculation is dead on arrival.

Run alone on the real chip from the repo root:
    python benchmarks/decode_bench.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from benchmarks.timing import bench_loop
from instructany2pix_tpu.ops import quant as Q

SHAPES = [(4096, 12288), (4096, 4096), (4096, 11008), (11008, 4096)]


def main():
    rs = np.random.RandomState(0)

    print("--- grouped variant sweep (M=1) ---", flush=True)
    for K, N in SHAPES:
        w = jnp.asarray(rs.randn(K, N).astype(np.float32) * 0.02)
        qz = Q.quantize_weight_int4_grouped(w)
        x = jnp.asarray(rs.randn(1, K).astype(np.float32)).astype(jnp.bfloat16)
        floor = K * N / 2 / 819e9 * 1e6
        row = []
        for variant in ("chain", "batched", "tile"):
            Q._QMV_GROUPED_VARIANT = variant
            t = bench_loop(
                lambda x, qq: Q.pallas_qmatmul(x, qq), (x, qz), iters=1000
            )
            row.append(f"{variant} {t*1e6:6.1f}us ({t*1e6/floor:.2f}x)")
        Q._QMV_GROUPED_VARIANT = "chain"
        print(f"{K}x{N} (floor {floor:5.1f}us): " + "  ".join(row), flush=True)

    print("--- speculation breakeven: M-scaling of the verify pass ---",
          flush=True)
    for K, N in SHAPES:
        w = jnp.asarray(rs.randn(K, N).astype(np.float32) * 0.02)
        qz = Q.quantize_weight_int4_grouped(w)
        t1 = None
        row = []
        for m in (1, 2, 4, 8):
            x = jnp.asarray(
                rs.randn(m, K).astype(np.float32)
            ).astype(jnp.bfloat16)
            t = bench_loop(
                lambda x, qq: Q.pallas_qmatmul(x, qq), (x, qz), iters=1000
            )
            t1 = t1 or t
            row.append(f"M={m} {t*1e6:6.1f}us ({t/t1:.2f}x)")
        print(f"{K}x{N}: " + "  ".join(row), flush=True)


if __name__ == "__main__":
    main()
