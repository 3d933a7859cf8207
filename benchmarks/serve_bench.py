"""Batched-serving CFG denoise throughput at 512². The loop sweeps
CFG batch 2/8/16 = 1/4/8 images per step; the footprint routing sends
batch≥4 seq-1024 attention to flash ((4,20,1024,64) = 84M ≥ 32M),
which the r2 serving numbers predate.

Run alone on the real chip from the repo root.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "..")
from benchmarks.timing import bench_loop
from instructany2pix_tpu.models import unet as unet_lib
from instructany2pix_tpu.diffusion import sampler as S


def main():
    cfg = unet_lib.UNetConfig.sdxl_base(with_ip=True)

    @jax.jit
    def _init(k):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), unet_lib.init(k, cfg)
        )

    t0 = time.perf_counter()
    params = _init(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

    for batch in (2, 8, 16):
        kk = jax.random.key(batch)
        lat = jax.random.normal(kk, (batch, 64, 64, 4), jnp.bfloat16)
        ctx = jax.random.normal(kk, (batch, 77, cfg.cross_attention_dim), jnp.bfloat16)
        pooled = jax.random.normal(kk, (batch, 1280), jnp.bfloat16)
        tid = jnp.tile(S.default_time_ids(512, 512, 1), (batch, 1))
        ip = jax.random.normal(kk, (batch, 4, cfg.cross_attention_dim), jnp.bfloat16)
        t = jnp.full((batch,), 500, jnp.int32)

        def step(lat, params, ctx, pooled, tid, ip):
            out = unet_lib.apply(
                params, lat, t, ctx, cfg, pooled_text=pooled, time_ids=tid,
                ip_tokens=ip, ip_scale=0.6,
            )
            return out[0] if isinstance(out, tuple) else out

        ts = bench_loop(step, (lat, params, ctx, pooled, tid, ip), iters=30)
        # batch = 2*images under CFG; 50-step edit throughput per chip
        imgs = batch / 2
        print(
            f"batch {batch:2d} (CFG, {imgs:.0f} img): {ts*1e3:6.2f} ms/step  "
            f"-> {imgs/(ts*50):.3f} img/s/chip at 50 steps",
            flush=True,
        )


if __name__ == "__main__":
    main()
