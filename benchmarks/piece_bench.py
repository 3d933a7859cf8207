import sys; sys.path.insert(0, "/root/repo")
"""Per-piece decomposition of the SDXL-base CFG step (batch 2).

    python benchmarks/piece_bench.py [latent_hw]   # 128 (1024² edit, default) or 64 (512²)

Times one resnet and one full transformer block at each level so the
full step (119.6 ms at 128², 27.7 ms at 64²) can be attributed.
Run alone on the real chip from the repo root.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import bench_loop, roundtrip
from instructany2pix_tpu.models import unet as U
from instructany2pix_tpu.models import layers as L


def main():
    import sys as _sys

    lat = int(_sys.argv[1]) if len(_sys.argv) > 1 else 128
    rt = roundtrip()
    print(f"device {jax.devices()[0].device_kind}  rt {rt*1e3:.1f}ms", flush=True)
    kc_key = [jax.random.PRNGKey(0)]

    def kc():
        kc_key[0], k = jax.random.split(kc_key[0])
        return k

    temb_dim = 1280
    ctx_dim = 2048
    bsz = 2

    # (spatial, channels, heads, tdepth, n_resnets, n_tblocks) per level
    # at 128² latents; resnet/tblock counts = down+up+mid totals
    LEVELS = [
        (lat, 320, None, 0, 5, 0),
        (lat // 2, 640, 10, 2, 5, 5),
        (lat // 4, 1280, 20, 10, 7, 5),
    ]

    total = 0.0
    for hw, ch, heads, depth, n_res, n_tb in LEVELS:
        x = jax.random.normal(kc(), (bsz, hw, hw, ch), jnp.bfloat16)
        temb = jax.random.normal(kc(), (bsz, temb_dim), jnp.bfloat16)

        rp = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            U._resnet_init(kc, ch, ch, temb_dim),
        )

        def res_fn(x, rp, temb):
            return U._resnet(rp, x, temb, 32)

        t_res = bench_loop(res_fn, (x, rp, temb), iters=100, rt=rt)
        line = f"L{hw} ({ch}ch): resnet {t_res*1e6:7.1f}us x{n_res} = {t_res*n_res*1e3:5.2f}ms"
        total += t_res * n_res

        if n_tb:
            tp = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16),
                U._transformer_init(kc, ch, ctx_dim, heads, depth, True, True),
            )
            ctx = jax.random.normal(kc(), (bsz, 77, ctx_dim), jnp.bfloat16)
            ip = jax.random.normal(kc(), (bsz, 4, ctx_dim), jnp.bfloat16)

            def tb_fn(x, tp, ctx, ip):
                return U._transformer(
                    tp, x, ctx, heads, depth, 32, True, ip, 0.6
                )

            t_tb = bench_loop(tb_fn, (x, tp, ctx, ip), iters=30, rt=rt)
            line += f"   tblock({depth} deep) {t_tb*1e6:8.1f}us x{n_tb} = {t_tb*n_tb*1e3:5.2f}ms"
            total += t_tb * n_tb
        print(line, flush=True)

    print(f"sum of pieces ≈ {total*1e3:.1f} ms (full step: 119.6 ms at 128², 27.7 at 64²)", flush=True)


if __name__ == "__main__":
    main()
