import sys; sys.path.insert(0, "/root/repo")
"""Dev bench: full SDXL UNet CFG forward (batch 2) at the 512² and
1024² edit configs, A/B'ing the flash-attention routing window.

  IA2P_FLASH_MIN_SEQ=2048 python dev_step_bench.py 1024   # current
  IA2P_FLASH_MIN_SEQ=1024 python dev_step_bench.py 1024   # candidate

Run alone on the real chip.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

from benchmarks.timing import bench_loop, roundtrip
from instructany2pix_tpu.diffusion import ip_adapter as ipa
from instructany2pix_tpu.models import unet as unet_lib
from instructany2pix_tpu.diffusion import sampler as S


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    lat_hw = size // 8
    rt = roundtrip()
    print(
        f"device {jax.devices()[0].device_kind}  size {size}  "
        f"IA2P_FLASH_MIN_SEQ={os.environ.get('IA2P_FLASH_MIN_SEQ', '(default)')}  "
        f"rt {rt*1e3:.1f}ms"
    )

    cfg = unet_lib.UNetConfig.sdxl_base(with_ip=True)
    t0 = time.perf_counter()

    @jax.jit
    def _init(k):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), unet_lib.init(k, cfg)
        )

    params = _init(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

    kk = jax.random.key(1)
    lat = jax.random.normal(kk, (2, lat_hw, lat_hw, 4), jnp.bfloat16)
    ctx = jax.random.normal(kk, (2, 77, cfg.cross_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(kk, (2, 1280), jnp.bfloat16)
    tid = jnp.tile(S.default_time_ids(size, size, 1), (2, 1))
    ip_tokens = jax.random.normal(kk, (2, 4, cfg.cross_attention_dim), jnp.bfloat16)
    t = jnp.full((2,), 500, jnp.int32)

    # params ride as a loop argument — closure capture would bake the
    # 5.8 GB tree into the graph as constants (hour-long compile).
    def step(lat, params, ctx, pooled, tid, ip_tokens):
        out = unet_lib.apply(
            params, lat, t, ctx, cfg, pooled_text=pooled, time_ids=tid,
            ip_tokens=ip_tokens, ip_scale=0.6,
        )
        return out[0] if isinstance(out, tuple) else out

    t0 = time.perf_counter()
    tstep = bench_loop(
        step, (lat, params, ctx, pooled, tid, ip_tokens),
        iters=30, rt=rt, reps=3,
    )
    print(
        f"CFG UNet fwd (batch 2, {lat_hw}² latents): "
        f"{tstep*1e3:.2f} ms   (compile+bench {time.perf_counter()-t0:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
