import sys; sys.path.insert(0, "/root/repo")
"""Dev bench: SDXL conv-path formulations at the 1024^2-edit shapes.

The 1024^2 e2e leftover (docs/PERF.md, VERDICT r2 weak #4): conv path
~8.1 ms/CFG-step at ~37% of its roofline. A/B XLA's native NHWC conv
against matmul decompositions that feed the MXU directly:

  xla    lax.conv_general_dilated (current layers.conv2d)
  tap9   9 shifted (B*H*W, Cin) @ (Cin, Cout) matmuls, accumulated
  im2col (B*H*W, 9*Cin) gather -> one matmul
  gnconv group_norm(+SiLU) -> conv, both formulations (the real
         resnet sequence; measures what fusion XLA already does)

Run alone on the real chip: python dev_conv_bench.py [xla|tap9|...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.models import layers as L

DT = jnp.bfloat16

# (batch, H, W, Cin, Cout): SDXL base at 128^2 latents (1024^2 image).
# batch 2 = CFG denoise; batch 1 = inversion.
SHAPES = [
    (2, 128, 128, 320, 320),
    (2, 64, 64, 640, 640),
    (2, 32, 32, 1280, 1280),
    (1, 128, 128, 320, 320),
    (2, 64, 64, 320, 640),  # level-transition resnet
    (1, 32, 32, 1280, 1280),   # inversion at 1024px, level 2
    (2, 16, 16, 1280, 1280),   # 512px edit, level 2
    (2, 32, 32, 1536, 1536),   # refiner at 1024px
    (1, 64, 64, 640, 640),     # inversion level 1
]


def conv_xla(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


def conv_tap9(x, w, b):
    """3x3 SAME conv as 9 shifted matmuls: each tap is a full-size
    (B*H*W, Cin) @ (Cin, Cout) dot on a zero-padded slice — M is large
    (32768 at 128^2 batch 2), K/N are the channel dims, exactly the
    matmul class the MXU runs at peak."""
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((bsz, h, wd, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (bsz, h, wd, cin))
            acc = acc + jax.lax.dot_general(
                xs.reshape(-1, cin),
                w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(bsz, h, wd, cout)
    return acc.astype(x.dtype) + b


def conv_im2col(x, w, b):
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (bsz, h, wd, cin))
        for dy in range(3)
        for dx in range(3)
    ]
    xc = jnp.concatenate(cols, axis=-1).reshape(-1, 9 * cin)
    y = jax.lax.dot_general(
        xc,
        w.reshape(9 * cin, cout),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(bsz, h, wd, cout).astype(x.dtype) + b


FORMS = {"xla": conv_xla, "tap9": conv_tap9, "im2col": conv_im2col}


from benchmarks.timing import bench_loop, roundtrip

_RT = None


def bench(fn, args, iters=100):
    global _RT
    if _RT is None:
        _RT = roundtrip()
        print(f"roundtrip {_RT*1e3:.1f} ms", file=sys.stderr)
    return bench_loop(fn, args, iters=iters, rt=_RT) * 1e6


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("device:", jax.devices()[0].device_kind, file=sys.stderr)
    rs = np.random.RandomState(0)
    for bsz, h, wd, cin, cout in SHAPES:
        x = jnp.asarray(rs.randn(bsz, h, wd, cin), DT)
        w = jnp.asarray(rs.randn(3, 3, cin, cout) * (9 * cin) ** -0.5, DT)
        b = jnp.zeros((cout,), DT)
        flops = 2 * bsz * h * wd * 9 * cin * cout
        floor = flops / 197e12 * 1e6
        row = f"({bsz},{h},{wd},{cin})->{cout}  floor {floor:6.1f}us :"
        ref = None
        for name, fn in FORMS.items():
            if which not in ("all", name, "gnconv"):
                continue
            out = fn(x, w, b)
            if ref is None:
                ref = out
            err = float(
                jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
            )
            t = bench(fn, (x, w, b))
            row += f"  {name} {t:7.1f}us ({flops/t*1e-6:5.1f} TF/s, err {err:.1e})"
        print(row, flush=True)

    if which in ("all", "gnconv"):
        print("--- group_norm+SiLU -> conv (resnet first half) ---")
        for bsz, h, wd, cin, cout in SHAPES[:3]:
            x = jnp.asarray(rs.randn(bsz, h, wd, cin), DT)
            w = jnp.asarray(rs.randn(3, 3, cin, cout) * (9 * cin) ** -0.5, DT)
            b = jnp.zeros((cout,), DT)
            gp = {"g": jnp.ones((cin,), DT), "b": jnp.zeros((cin,), DT)}

            def gn_xla(x, w, b):
                h_ = L.group_norm(gp, x, 32, silu=True)
                return conv_xla(h_, w, b)

            def gn_tap9(x, w, b):
                h_ = L.group_norm(gp, x, 32, silu=True)
                return conv_tap9(h_, w, b)

            t1 = bench(gn_xla, (x, w, b))
            t2 = bench(gn_tap9, (x, w, b))
            print(
                f"({bsz},{h},{wd},{cin})->{cout}: gn+xla {t1:7.1f}us  "
                f"gn+tap9 {t2:7.1f}us",
                flush=True,
            )


if __name__ == "__main__":
    main()
