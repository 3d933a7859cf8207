"""One-off block-shape sweep for the flash fwd kernel at the 1024²
SDXL shapes (two-point timing). Run alone on the real chip:

    python benchmarks/flash_sweep.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from benchmarks.timing import bench_loop
from instructany2pix_tpu.ops.flash_attention import flash_attention

SHAPES = [(2, 10, 4096, 64), (2, 20, 4096, 64), (1, 10, 4096, 64)]
BLOCKS = [
    (512, 1024),  # current default
    (512, 2048),
    (1024, 1024),
    (1024, 2048),
    (2048, 1024),
    (256, 4096),  # single k-pass: no online-softmax rescale
    (512, 4096),
]


def main():
    rs = np.random.RandomState(0)
    for b, h, s, d in SHAPES:
        q = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
        k = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
        v = jnp.asarray(rs.randn(b, h, s, d), jnp.bfloat16)
        flops = 4 * b * h * s * s * d
        print(f"== ({b},{h},{s},{d})", flush=True)
        for bq, bk in BLOCKS:
            fl = lambda q, k, v: flash_attention(q, k, v, block_q=bq, block_k=bk)
            try:
                t = bench_loop(fl, (q, k, v), iters=50)
            except Exception as e:  # noqa: BLE001
                print(f"  bq{bq}/bk{bk}: FAIL {type(e).__name__}", flush=True)
                continue
            print(f"  bq{bq}/bk{bk}: {t*1e6:.0f} us  {flops/t/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
