import sys; sys.path.insert(0, "/root/repo")
"""Dev bench: SAM ViT-H 1024px encode + full segmentor call on the
real TPU chip (subject-consistency stage, BASELINE config 4).

A/B's the serving dtype (bf16 vs f32) through the jitted
make_segmentor path. Run alone — one chip.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from instructany2pix_tpu.grounding import sam as S


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timeit(fn, n=10, warmup=2):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn())
    return (time.perf_counter() - t0) / n


def main():
    log("device:", jax.devices()[0].device_kind)
    # tunnel roundtrip correction
    z = jnp.zeros((8, 128))
    rt = timeit(lambda: z + 1.0, n=20)
    log(f"host-sync roundtrip: {rt*1e3:.1f} ms")

    cfg = S.SAMConfig.vit_h()
    log("init ViT-H params ...")
    t0 = time.perf_counter()
    params = S.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        params,
    )
    log(f"  init {time.perf_counter()-t0:.1f}s")

    x = jnp.asarray(
        np.random.RandomState(0).rand(1, cfg.img_size, cfg.img_size, 3),
        jnp.bfloat16,
    )
    enc_ = jax.jit(lambda p, xx: S.encoder_apply(p, xx, cfg))
    enc = lambda xx: enc_(params["encoder"], xx)
    t0 = time.perf_counter()
    sync(enc(x))
    log(f"  encoder compile+first: {time.perf_counter()-t0:.1f}s")
    t = timeit(lambda: enc(x), n=5) - rt
    log(f"SAM ViT-H 1024px encode (bf16): {t*1e3:.1f} ms")

    # f32 A/B
    p32 = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.bfloat16)
        else a,
        params,
    )
    enc32 = lambda xx: enc_(p32["encoder"], xx)
    t0 = time.perf_counter()
    sync(enc32(x.astype(jnp.float32)))
    log(f"  f32 compile+first: {time.perf_counter()-t0:.1f}s")
    t32 = timeit(lambda: enc32(x.astype(jnp.float32)), n=5) - rt
    log(f"SAM ViT-H 1024px encode (f32): {t32*1e3:.1f} ms")

    # full segmentor call (preprocess + encode + decode + resize)
    seg = S.make_segmentor(params, cfg)
    img = (np.random.RandomState(1).rand(768, 1024, 3) * 255).astype(np.uint8)
    box = np.array([100, 100, 600, 500], np.float32)
    t0 = time.perf_counter()
    seg(img, box)
    log(f"  segmentor compile+first: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(3):
        seg(img, box)
    log(f"segmentor full call (bf16, incl. host pre/post): {(time.perf_counter()-t0)/3*1e3:.1f} ms")


if __name__ == "__main__":
    main()
