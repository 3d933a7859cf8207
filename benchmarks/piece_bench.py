import sys; sys.path.insert(0, "/root/repo")
"""Per-piece decomposition of the SDXL-base CFG step (batch 2).

    python benchmarks/piece_bench.py [latent_hw]   # 128 (1024² edit, default) or 64 (512²)

EXACT block inventory: every resnet is timed at its true (cin→cout)
— the up-path resnets take concatenated skip inputs (cin up to 2560) —
and the mid transformer block is counted (the r3-session table missed
it, which is where most of the old "~25 ms unattributed glue" lived).
Samplers and conv_in/out are timed too, so sum-of-pieces ≈ full step.
Run alone on the real chip from the repo root.
"""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import bench_loop, roundtrip
from instructany2pix_tpu.models import layers as L
from instructany2pix_tpu.models import unet as U

TEMB = 1280
CTX = 2048
B = 2

# (hw_div, cin, cout) for all 17 resnets of SDXL-base (down 5 + mid 2 + up 9)
RESNETS = [
    (1, 320, 320), (1, 320, 320),                       # down_0
    (2, 320, 640), (2, 640, 640),                       # down_1
    (4, 640, 1280), (4, 1280, 1280),                    # down_2
    (4, 1280, 1280), (4, 1280, 1280),                   # mid
    (4, 2560, 1280), (4, 2560, 1280), (4, 1920, 1280),  # up_0 (skip concats)
    (2, 1920, 640), (2, 1280, 640), (2, 960, 640),      # up_1
    (1, 960, 320), (1, 640, 320), (1, 640, 320),        # up_2
]

# (hw_div, ch, heads, depth, count) — d1 2 + u1 3 at depth 2;
# d2 2 + MID 1 + u0 3 at depth 10
TBLOCKS = [
    (2, 640, 10, 2, 5),
    (4, 1280, 20, 10, 6),
]

# extra convs: (hw_div_in, cin, cout, stride, upsample_first)
SAMPLERS = [
    ("conv_in", 1, 4, 320, 1, False),
    ("down0", 1, 320, 320, 2, False),
    ("down1", 2, 640, 640, 2, False),
    ("up0 us+conv", 4, 1280, 1280, 1, True),
    ("up1 us+conv", 2, 640, 640, 1, True),
    ("conv_out(+gn)", 1, 320, 4, 1, False),
]


def main():
    lat = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rt = roundtrip()
    print(f"device {jax.devices()[0].device_kind}  rt {rt*1e3:.1f}ms  latents {lat}²", flush=True)
    kc_key = [jax.random.PRNGKey(0)]

    def kc():
        kc_key[0], k = jax.random.split(kc_key[0])
        return k

    bf = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)
    total = 0.0

    # --- resnets, grouped by identical (hw, cin, cout)
    from collections import Counter

    res_counts = Counter(RESNETS)
    temb = jax.random.normal(kc(), (B, TEMB), jnp.bfloat16)
    res_total = 0.0
    for (div, cin, cout), cnt in sorted(res_counts.items()):
        hw = lat // div
        x = jax.random.normal(kc(), (B, hw, hw, cin), jnp.bfloat16)
        rp = bf(U._resnet_init(kc, cin, cout, TEMB))
        t = bench_loop(lambda x, rp, temb: U._resnet(rp, x, temb, 32),
                       (x, rp, temb), iters=100, rt=rt)
        print(f"resnet L{hw:3d} {cin:4d}->{cout:4d}: {t*1e6:7.1f}us x{cnt} = {t*cnt*1e3:5.2f}ms", flush=True)
        res_total += t * cnt
    print(f"  resnets total {res_total*1e3:.1f} ms", flush=True)
    total += res_total

    # --- transformer blocks
    for div, ch, heads, depth, cnt in TBLOCKS:
        hw = lat // div
        x = jax.random.normal(kc(), (B, hw, hw, ch), jnp.bfloat16)
        tp = bf(U._transformer_init(kc, ch, CTX, heads, depth, True, True))
        ctx = jax.random.normal(kc(), (B, 77, CTX), jnp.bfloat16)
        ip = jax.random.normal(kc(), (B, 4, CTX), jnp.bfloat16)
        t = bench_loop(
            lambda x, tp, ctx, ip: U._transformer(tp, x, ctx, heads, depth, 32, True, ip, 0.6),
            (x, tp, ctx, ip), iters=30, rt=rt)
        print(f"tblock L{hw:3d} ({depth:2d} deep, {ch}ch): {t*1e6:8.1f}us x{cnt} = {t*cnt*1e3:5.2f}ms", flush=True)
        total += t * cnt

    # --- samplers / in / out convs
    samp_total = 0.0
    for name, div, cin, cout, stride, us in SAMPLERS:
        hw = lat // div
        x = jax.random.normal(kc(), (B, hw, hw, cin), jnp.bfloat16)
        cp = bf(L.conv_init(kc(), cin, cout, 3))
        if us:
            fn = lambda x, cp: L.conv2d(cp, L.upsample2x_nearest(x))
        elif stride == 2:
            fn = lambda x, cp: L.conv2d(cp, x, stride=2, padding=[(1, 1), (1, 1)])
        elif name.startswith("conv_out"):
            gp = bf(L.group_norm_init(cin))
            fn = lambda x, cp, gp=gp: L.conv2d(cp, L.group_norm(gp, x, 32, silu=True))
        else:
            fn = lambda x, cp: L.conv2d(cp, x)
        t = bench_loop(fn, (x, cp), iters=100, rt=rt)
        print(f"{name:14s} L{hw:3d} {cin:4d}->{cout:4d}: {t*1e6:7.1f}us", flush=True)
        samp_total += t
    print(f"  samplers/in/out total {samp_total*1e3:.1f} ms", flush=True)
    total += samp_total

    print(f"sum of pieces ≈ {total*1e3:.1f} ms (full step measured: 119.6 ms at 128², 27.7 at 64²)", flush=True)


if __name__ == "__main__":
    main()
