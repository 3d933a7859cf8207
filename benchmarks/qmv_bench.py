"""Quantized decode matvec kernels at the 7B shapes (two-point timing;
weights ride as loop ARGUMENTS — closure capture bakes them in as
constants and produces sub-floor nonsense, see README.md).

Run alone on the real chip from the repo root:
    python benchmarks/qmv_bench.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from benchmarks.timing import bench_loop
from instructany2pix_tpu.ops import quant as Q

# (K, N): vicuna-7B qkv-ish, o, up/gate, down
SHAPES = [(4096, 12288), (4096, 4096), (4096, 11008), (11008, 4096)]


def main():
    rs = np.random.RandomState(0)
    for K, N in SHAPES:
        w = jnp.asarray(rs.randn(K, N).astype(np.float32) * 0.02)
        x = jnp.asarray(rs.randn(1, K).astype(np.float32)).astype(jnp.bfloat16)
        floor8 = K * N / 819e9 * 1e6
        for name, qz in [
            ("int8", Q.quantize_weight(w)),
            ("int4pc", Q.quantize_weight_int4(w)),
            ("int4grp", Q.quantize_weight_int4_grouped(w)),
        ]:
            t = bench_loop(
                lambda x, qq: Q.pallas_qmatmul(x, qq), (x, qz), iters=1000
            )
            floor = floor8 if name == "int8" else floor8 / 2
            print(
                f"{K}x{N} {name:8s}: {t*1e6:6.1f}us (floor {floor:5.1f}us, "
                f"{t*1e6/floor:.2f}x)",
                flush=True,
            )


if __name__ == "__main__":
    main()
