"""Benchmark: full-size SDXL UNet denoise step on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: projected 50-step 512x512 edit latency (the BASELINE.json
north-star config) = 50 x CFG-batched UNet eps step at 64x64 latents,
bf16, IP-Adapter tokens active. vs_baseline is measured against the
2.0 s north-star target (>1.0 = faster than target).

Extra context lines go to stderr so stdout stays one JSON line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from instructany2pix_tpu.models import unet as unet_lib

    cfg = unet_lib.UNetConfig.sdxl_base(with_ip=True)
    log("initializing SDXL UNet params (bf16)...")
    t0 = time.perf_counter()
    params = unet_lib.init(jax.random.key(0), cfg)
    # cast per-subtree so the fp32 and bf16 trees never coexist in HBM
    # (2.9B params: 11.6 GB fp32 + 5.8 GB bf16 would overflow the chip)
    for k in list(params):
        params[k] = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params[k])
        jax.block_until_ready(params[k])
    from instructany2pix_tpu.core.tree import param_count

    log(f"params: {param_count(params)/1e9:.2f}B in {time.perf_counter()-t0:.1f}s")

    b = 2  # CFG pair for one image
    lat = jax.random.normal(jax.random.key(1), (b, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((b,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (b, 77, 2048), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(3), (b, 1280), jnp.bfloat16)
    tid = jnp.tile(jnp.asarray([[512, 512, 0, 0, 512, 512]], jnp.float32), (b, 1))
    ip = jax.random.normal(jax.random.key(4), (b, 4, 2048), jnp.bfloat16)

    @jax.jit
    def step(params, lat, t, ctx, pooled, tid, ip):
        return unet_lib.apply(
            params, lat, t, ctx, cfg, pooled_text=pooled, time_ids=tid,
            ip_tokens=ip, ip_scale=1.0,
        )

    log("compiling...")
    t0 = time.perf_counter()
    out = step(params, lat, t, ctx, pooled, tid, ip)
    out.block_until_ready()
    log(f"compile+first step: {time.perf_counter()-t0:.1f}s")

    # Timing notes for the axon remote backend: block_until_ready
    # returns before device execution completes, and deep unsynced
    # dispatch chains exhaust the relay queue — so sync each step with
    # a host readback and subtract the measured sync roundtrip.
    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    sync(step(params, lat, t, ctx, pooled, tid, ip))  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        sync(lat)
    t_sync = (time.perf_counter() - t0) / 5

    n = 10
    cur = lat
    t0 = time.perf_counter()
    for _ in range(n):
        cur = step(params, cur, t, ctx, pooled, tid, ip)
        sync(cur)
    total = time.perf_counter() - t0
    step_ms = (total / n - t_sync) * 1e3
    log(
        f"unet cfg-step: {step_ms:.2f} ms"
        f" (sync roundtrip {t_sync * 1e3:.1f} ms, raw {total / n * 1e3:.1f} ms/iter)"
    )

    edit_latency_s = 50 * step_ms / 1e3
    print(
        json.dumps(
            {
                "metric": "sdxl_unet_50step_512px_edit_latency",
                "value": round(edit_latency_s, 3),
                "unit": "s",
                "vs_baseline": round(2.0 / edit_latency_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
